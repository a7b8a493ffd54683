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


QUERIES: dict[str, Query] = {
    "token_count": Query(_q_token_count, _TOKEN_COUNT_SQL, "whitespace token counting"),
    "doc_fingerprint": Query(_q_fingerprint, _FINGERPRINT_SQL, "md5 document fingerprint"),
    "exact_dedup": Query(_q_exact_dedup, _EXACT_DEDUP_SQL, "exact dedup via hash-groupBy"),
}
