"""Count-min sketch over n-gram streams — the fixed-size-state answer to
"which grams are heavy corpus-wide?" (Cormode & Muthukrishnan 2005,
"An improved data stream summary: the count-min sketch and its
applications").  At 100 TB an exact gram-count table scales with corpus
vocabulary; the sketch is a (depth x width) integer grid whose size never
grows — the build is ONE groupBy over depth*width cells regardless of
input volume (map-side partial sums do almost all the work), and lookups
are a broadcast join of the tiny cell table.

Everything is DETERMINISTIC and engine-portable: the d row-hashes are
md5-hex folds of ``"cms{row}:" + gram`` (the temperature-sample draw
pattern), so the DuckDB oracle reproduces every cell and every estimate
exactly — an APPROXIMATE operator with an EXACT oracle.  The classic
guarantees hold per construction: estimate >= true count always
(counters only over-count), and P[estimate > true + eps*N] <= delta with
eps = e/width, delta = e^-depth.

Reference parity note: the reference system has no sketch surface; this
module belongs to the training-data-pipeline extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024
_HEX_DIGITS = 5          # 16^5 = 1,048,576 >> width; short oracle fold


def cms_bucket(item: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row`` bucket of ``item``: first 5 hex digits of
    md5('cms{row}:' || item) as an integer, mod width — reproduced
    verbatim by the DuckDB oracle via the strpos hex fold."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), item)),
                    1, _HEX_DIGITS),
        16, 10,
    ).cast("long")
    return (h % width).cast("int")


def _bucketed(items: DataFrame, item_col: str, depth: int,
              width: int) -> DataFrame:
    """(item, depth, bucket) — one row per sketch row per input row."""
    rows = F.array(*[
        F.struct(
            F.lit(j).alias("depth"),
            cms_bucket(F.col(item_col), j, width).alias("bucket"),
        )
        for j in range(depth)
    ])
    return items.select(
        F.col(item_col), F.explode(rows).alias("_db")
    ).select(item_col, "_db.depth", "_db.bucket")


def cms_build(items: DataFrame, item_col: str = "item",
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) with at most depth*width
    rows — fixed-size state no matter the stream length.  The exploded
    stream never shuffles at item granularity: the single exchange is the
    groupBy on (depth, bucket), whose map-side partials collapse each
    partition to <= depth*width rows before the wire."""
    return (
        _bucketed(items, item_col, depth, width)
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 item_col: str = "item", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch for every probe item: min over the d cells
    the item hashes into.  The sketch is broadcast (<= depth*width rows);
    a cell no probe stream ever touched reads as 0.
    Output: (item_col, cms_estimate)."""
    return (
        _bucketed(probes, item_col, depth, width)
        .join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
             .alias("cms_estimate"))
    )
