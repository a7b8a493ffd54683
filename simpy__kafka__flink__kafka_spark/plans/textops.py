"""Text-analysis / dedup queries over the ``documents`` table (the
training-data-pipeline extension operators — SURVEY.md §2 north-star list).

Initial slice: token counting, document fingerprinting, exact dedup.
(MinHash-LSH, SimHash, n-gram Jaccard, language-ID, quality scoring land in
``functions/`` with their own declared queries.)

Cross-engine determinism: fingerprints use ``md5`` (identical hex output in
Spark and DuckDB); whitespace handling is guarded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm():
    return F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))


# --- token count (whitespace tokenizer) --------------------------------------

def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.trim(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")  # DuckDB len() is BIGINT; keep schemas aligned
        .alias("n_tokens"),
        F.col("n_chars"),
    )


_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       n_chars
FROM documents
"""


# --- document fingerprint (md5 over normalized text) -------------------------

def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(_norm()).alias("fingerprint")
    )


_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


# --- exact dedup (hash-groupBy; keep lowest doc_id) --------------------------

def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(_norm()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_EXACT_DEDUP_SQL = r"""
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --- winnowing fingerprints (rolling-hash; per-doc sliding window) -----------

def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir))


# mirrors functions/text.py:winnow_fingerprints — n=3 word shingles,
# window=4, lexicographic min over md5 hex, full windows only
_WINNOW_SQL = r"""
WITH w AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id, u.p AS pos, md5(u.s) AS h FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
           i -> struct_pack(p := i - 1, s := array_to_string(ws[i:i+2], ' ')))) AS u
    FROM w)
),
x AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY doc_id) AS n_sh,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM sh
)
SELECT DISTINCT doc_id, fp FROM x WHERE pos <= n_sh - 4
"""


QUERIES: dict[str, Query] = {
    "token_count": Query(_q_token_count, _TOKEN_COUNT_SQL, "whitespace token counting"),
    "doc_fingerprint": Query(_q_fingerprint, _FINGERPRINT_SQL, "md5 document fingerprint"),
    "exact_dedup": Query(_q_exact_dedup, _EXACT_DEDUP_SQL, "exact dedup via hash-groupBy"),
    "winnow_fingerprints": Query(_q_winnow, _WINNOW_SQL,
                                 "rolling-hash winnowing fingerprint set"),
}
