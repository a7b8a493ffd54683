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


HLL_B = 8                       # 2^8 = 256 registers
HLL_HASH_HEX = 12               # 48-bit hash: 8 register bits + 40 rho bits


def _bitlen(w: Column, maxbits: int) -> Column:
    """Integer bit length of ``w`` (0 for 0) as a chained comparison —
    no float log2, so Spark and the generated DuckDB CASE agree exactly
    at every power-of-two boundary."""
    out = F.lit(0)
    for k in range(maxbits):              # low to high; later whens win
        out = F.when(w >= 2 ** k, k + 1).otherwise(out)
    return out


def hll_registers(items: DataFrame, item_col: str = "item",
                  b: int = HLL_B) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) with
    engine-portable hashing: H = first 12 hex digits of md5(item) as a
    48-bit integer; register = H mod 2^b; rho = leading zeros of the
    remaining (48 - b)-bit word + 1.  Output (register, max_rho) is PURE
    INTEGERS — at most 2^b rows after one groupBy with map-side partial
    max, so the sketch state is fixed-size at any stream length and the
    DuckDB oracle reproduces it exactly.  The float estimator
    (alpha_m * m^2 / sum 2^-M, with the linear-counting small-range
    correction) deliberately lives OUTSIDE the oracled row (pytest
    computes it from the registers and checks accuracy against the exact
    distinct count) so no cross-engine libm difference can ever touch
    the hash-compared output."""
    wbits = 4 * HLL_HASH_HEX - b
    h = F.conv(
        F.substring(F.md5(F.col(item_col)), 1, HLL_HASH_HEX), 16, 10
    ).cast("long")
    reg = (h % (2 ** b)).cast("int")
    w = (h / F.lit(2 ** b)).cast("long")      # floor-div: h >= 0
    rho = (F.lit(wbits) - _bitlen(w, wbits) + 1).cast("int")
    return (
        items.select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], b: int = HLL_B) -> float:
    """Driver-side HLL estimator over a collected register table —
    the float arithmetic kept out of the oracled row by design.
    Standard bias-corrected formula with the linear-counting
    small-range correction."""
    import math

    m = 2 ** b
    maxr = {int(r): int(x) for r, x in registers}
    total = sum(2.0 ** -maxr.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / total
    zeros = m - len(maxr)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return e


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


BLOOM_M = 8192                  # filter bits
BLOOM_K = 4                     # hash functions


def bloom_bit(item: Column, k: int, m: int = BLOOM_M) -> Column:
    """Hash-``k`` bit position of ``item``: first 5 hex digits of
    md5('bloom{k}:' || item) as an integer, mod m — the cms_bucket
    pattern, reproduced verbatim by the DuckDB oracle."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bloom{k}:"), item)),
                    1, _HEX_DIGITS),
        16, 10,
    ).cast("long")
    return (h % m).cast("int")


def bloom_build(items: DataFrame, item_col: str = "item",
                n_hashes: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """Build the Bloom filter as its SET-BIT table: (bit) with at most
    ``m`` rows (Bloom 1970) — the fixed-size membership companion to the
    CMS (counts) and HLL (cardinality) sketches.  One exchange: the
    distinct over bit positions, map-side-combined to <= m rows per
    partition before the wire.  At 100 TB this is how a cheap
    pre-filter for dedup_against-style lookups ships: the bit table
    broadcast-joins against any probe stream."""
    bits = F.array(*[
        bloom_bit(F.col(item_col), k, m) for k in range(n_hashes)
    ])
    return (
        items.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_probe(filter_bits: DataFrame, probes: DataFrame,
                item_col: str = "item", n_hashes: int = BLOOM_K,
                m: int = BLOOM_M) -> DataFrame:
    """Membership probe: ``maybe = 1`` iff ALL k bit positions of the
    probe item are set in the filter (the Bloom contract: no false
    negatives; false positives at the classic (1 - e^-kn/m)^k rate,
    property-tested in pytest).  Broadcast left join of the probe
    stream's exploded bits onto the tiny bit table, then an all-present
    aggregation per item."""
    pb = probes.select(
        F.col(item_col),
        F.explode(F.array(*[
            bloom_bit(F.col(item_col), k, m) for k in range(n_hashes)
        ])).alias("bit"),
    )
    hit = pb.join(
        F.broadcast(filter_bits.withColumn("_set", F.lit(1))),
        "bit", "left")
    return (
        hit.groupBy(item_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_set", F.lit(0))))
             .cast("int").alias("maybe"))
    )
