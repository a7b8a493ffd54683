"""Regression tests for the round-15 ADVICE findings.

1. language_id_agg: NULL-text docs must keep a row (lang = LANGS[0],
   matching the per-row ``language_id`` twin) — the uncoalesced explode
   dropped them, and the inner joins in corpus_datasheet / ccnet_buckets
   then silently lost those docs (text.py).
2. admission url-dedup: the keeper computation must not put every row of
   a hot canonical URL into one unbounded window partition — covered by
   the plan-shape assertion in test_advice_fixes_r15 plus the existing
   admission parity suites (crawl.py).
"""
from __future__ import annotations


def test_language_id_agg_keeps_null_text_docs(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        LANGS, language_id, language_id_agg, words)

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat for it is that"),
         (2, None),
         (3, "der hund und die katze ist nicht ein zu mit auf")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang"]
           for r in language_id_agg(docs).collect()}
    # every input doc keeps a row, including the NULL-text one
    assert sorted(out) == [1, 2, 3]
    assert out[1] == "en"
    assert out[2] == LANGS[0]          # NULL text -> first language
    assert out[3] == "de"

    # parity with the per-row twin on the same frame (NULL included)
    per_row = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", language_id(words("text")).alias("lang")).collect()
    }
    assert out == per_row


def test_admission_keeper_has_no_unbounded_cu_window(spark):
    """The canonical-URL keeper must be a groupBy (map-side combinable)
    joined back, never `min() over (partition by cu)` with an unbounded
    frame — a hot canonical URL duplicated millions of times would land
    in ONE window partition on one task (round-15 advice)."""
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["crawl_admission"]
    df = q.build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(cu" in line.lower():
            raise AssertionError(
                "unbounded per-cu window back in the admission plan:\n"
                + line)
