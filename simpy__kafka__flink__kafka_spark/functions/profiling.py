"""Table profiling — the deequ-style data-quality audit a training-data
pipeline runs before trusting an input table: per-column row/null/distinct
counts and min/max, computed in ONE aggregation pass over the table.

Cross-engine determinism contract (for the DuckDB oracle twin): numeric
min/max are rounded doubles (exact stored values, deterministic
rounding); timestamps profile as epoch milliseconds (string formatting
of dates/timestamps differs between engines, integers do not); strings
compare binary/lexicographic identically in both engines.

Reference parity note: the reference system has no profiling surface;
this module belongs to the training-data-pipeline extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA = ("column string, n_rows long, n_nulls long, "
                  "n_distinct long, min_num double, max_num double, "
                  "min_str string, max_str string")


def profile_table(df: DataFrame, numeric_cols: list[str] | None = None,
                  string_cols: list[str] | None = None,
                  ts_cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str) — numeric columns fill the
    ``_num`` pair (rounded to 6), strings the ``_str`` pair, timestamps
    profile as epoch-millisecond numerics; the other pair is null.

    Scale shape: a single global aggregation (count / conditional sums /
    countDistinct / min / max for every column in one ``agg``) — Spark
    plans the multi-distinct via one expand + partial aggregation, so
    the table is scanned once regardless of column count; the per-column
    rows are assembled from the one aggregated row with a struct-array
    explode (no second pass, no per-column jobs).
    """
    numeric_cols = numeric_cols or []
    string_cols = string_cols or []
    ts_cols = ts_cols or []

    def val(c: str) -> Column:
        if c in ts_cols:
            # parquet NTZ timestamps: cast through TIMESTAMP under the
            # session's pinned UTC zone (session.py) so epoch millis
            # agree with DuckDB's epoch_ms on the same naive values
            return F.unix_millis(F.col(c).cast("timestamp")).cast("double")
        if c in numeric_cols:
            return F.col(c).cast("double")
        return F.col(c)

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in numeric_cols + ts_cols + string_cols:
        v = val(c)
        aggs += [
            F.sum(F.isnull(v).cast("int")).cast("long").alias(f"_nl_{c}"),
            F.countDistinct(v).cast("long").alias(f"_nd_{c}"),
        ]
        if c in string_cols:
            aggs += [F.min(v).alias(f"_mn_{c}"), F.max(v).alias(f"_mx_{c}")]
        else:
            aggs += [
                F.round(F.min(v), 6).alias(f"_mn_{c}"),
                F.round(F.max(v), 6).alias(f"_mx_{c}"),
            ]
    prof = df.agg(*aggs)
    entries = []
    for c in numeric_cols + ts_cols + string_cols:
        is_str = c in string_cols
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nl_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.lit(None).cast("double") if is_str
                 else F.col(f"_mn_{c}")).alias("min_num"),
                (F.lit(None).cast("double") if is_str
                 else F.col(f"_mx_{c}")).alias("max_num"),
                (F.col(f"_mn_{c}") if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"_mx_{c}") if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return prof.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def corpus_datasheet(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     source_col: str = "source") -> DataFrame:
    """Per-source corpus datasheet (the Datasheets-for-Datasets /
    data-card posture): ONE row per source with the release-audit
    numbers a dataset consumer asks first — volume, token mass,
    duplication, dominant language, quality.  All integer or
    integer-scaled after the shared round(.,6) quality expression, so
    the row is hash-oracle-checkable.

    Columns: n_docs, n_tokens, n_unique_fp (distinct content
    fingerprints — dedup-normal-form md5), dup_ppm (1e6 *
    (n_docs - n_unique_fp) / n_docs, integer), top_lang (modal
    language_id prediction, ties to the alphabetically-first lang —
    deterministic), quality_micros_avg (mean heuristic quality scaled
    1e6, floor).

    Scale shape: one zero-shuffle per-doc projection (tokens, quality,
    fingerprint, lang — the ingest-scan riders), then ONE exchange
    keyed on (source, lang) for the modal-language count and ONE
    source-keyed aggregate; sources are dimension-cardinality so the
    final frames are broadcast-sized."""
    from .text import language_id_agg, normalized, quality_score, token_count

    from ..cachepin import pin

    # pinned: the per-doc projection (tokenize + md5 + lang + quality)
    # feeds BOTH the source aggregate and the modal-language aggregate,
    # which shuffle on different keys — no exchange reuse, so unpinned
    # it would execute twice (review find).  The language prediction
    # joins in from the codegen agg form (round-15: the per-row
    # interpreted fold cost ~2.6 s for 5000 docs inside this
    # projection).
    per = pin(docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        token_count(text_col).cast("long").alias("n_tok"),
        F.md5(normalized(text_col)).alias("fp"),
        F.floor(quality_score(text_col) * 1_000_000).cast("long")
        .alias("q_micros"),
    ).join(language_id_agg(docs, id_col=id_col, text_col=text_col),
           id_col).drop(id_col))
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.countDistinct("fp").cast("long").alias("n_unique_fp"),
        F.expr("sum(q_micros) div count(1)").cast("long")
        .alias("quality_micros_avg"),
    )
    lang_counts = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("_lc"))
    from pyspark.sql import Window as W

    wl = W.partitionBy("source").orderBy(F.col("_lc").desc(),
                                         F.col("lang"))
    top = (lang_counts.withColumn("_r", F.row_number().over(wl))
           .where(F.col("_r") == 1)
           .select("source", F.col("lang").alias("top_lang")))
    return (agg.join(top, "source")
            .select("source", "n_docs", "n_tokens", "n_unique_fp",
                    F.expr("(1000000 * (n_docs - n_unique_fp)) "
                           "div n_docs").cast("long").alias("dup_ppm"),
                    "top_lang", "quality_micros_avg"))


def media_datasheet(frames: dict[str, DataFrame]) -> DataFrame:
    """One data-card row per MEDIA source class (round 14 — the
    container front door joins the datasheet): input maps a class
    name to a per-file frame carrying any of the standard audit
    columns ``duration_ms`` / ``payload_bytes`` / ``n_tokens``
    (a class missing a column folds it to NULL — a PDF corpus has no
    duration, a movie corpus no tokens).

    Output: (source, n_docs, n_tokens, duration_ms_total,
    payload_bytes) — one row per class, classes in sorted-name order.
    Scale shape: each class is ONE global aggregate over an
    already-per-file frame (map-side combinable, broadcast-sized
    result); the union is dimension-cardinality."""
    if not frames:
        raise ValueError("media_datasheet requires at least one "
                         "class frame")
    outs = []
    for name in sorted(frames):
        df = frames[name]
        cols = set(df.columns)

        def val(c: str) -> Column:
            return (F.col(c) if c in cols
                    else F.lit(None).cast("long"))

        outs.append(df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(val("n_tokens")).cast("long").alias("n_tokens"),
            F.sum(val("duration_ms")).cast("long")
            .alias("duration_ms_total"),
            F.sum(val("payload_bytes")).cast("long")
            .alias("payload_bytes"),
        ).select(F.lit(name).alias("source"), "*"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
