"""Cross-snapshot incremental dedup (functions/dedup.py:dedup_against):
hand-built two-snapshot classifications plus the registry row's oracle
parity at sf0.001."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.dedup import (
    dedup_against, snapshot_profile)

PROSE = ("the quick brown fox jumps over the lazy dog while the "
         "patient heron watches the slow river drift past the old mill")


def _status(spark, prior_rows, new_rows):
    prior = snapshot_profile(spark.createDataFrame(
        prior_rows, "doc_id long, text string"))
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    return {r["doc_id"]: r["status"]
            for r in dedup_against(new, prior).collect()}


def test_classification_matrix(spark):
    got = _status(
        spark,
        [(1, PROSE), (2, "short doc")],  # doc 2: too short to shingle
        [
            (10, PROSE),                          # exact copy
            (11, "  " + PROSE.upper() + "  "),    # exact after normalization
            (12, PROSE + " with a small tail"),   # near copy
            (13, "short doc"),                    # exact via fingerprint only
            (14, "completely different words about winter mountain snow "
                 "and the long cold silence of the high empty passes"),
            (15, "tiny new"),                     # short AND unknown
        ],
    )
    assert got[10] == "exact_known"
    assert got[11] == "exact_known"   # normalized fingerprint match
    assert got[12] == "near_known"
    assert got[13] == "exact_known"   # prior doc had no signature
    assert got[14] == "fresh"
    assert got[15] == "fresh"
    assert len(got) == 6              # one row per new doc, always


def test_exact_wins_over_near(spark):
    # an exact copy also shares every LSH bucket — status must still be
    # exact_known (the documented priority)
    got = _status(spark, [(1, PROSE)], [(10, PROSE)])
    assert got == {10: "exact_known"}


def test_registry_row_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["dedup_against_prior"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "dedup_against_prior")


def test_snapshot_profile_local_twin_zero_shuffle_and_identical(spark):
    # default profile = the codegen groupBy pipeline (round-6 A/B: ~7x
    # faster cold than interpreted folds); local=True = the zero-shuffle
    # single-pass twin.  Values must be identical row for row.
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)

    docs = spark.createDataFrame(
        [(1, PROSE), (2, "short doc"), (3, PROSE + " and more words here")],
        "doc_id long, text string")
    prof = snapshot_profile(docs)
    loc = snapshot_profile(docs, local=True)
    plan = loc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # pure scan-side projection
    a = {r["prior_id"]: tuple(r[f"h{j}"] for j in range(8))
         for r in prof.collect()}
    b = {r["prior_id"]: tuple(r[f"h{j}"] for j in range(8))
         for r in loc.collect()}
    assert a == b
    assert a[2] == (None,) * 8             # too short to shingle


def test_crawl_admission_capstone(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["crawl_admission"]
    df = q.build(spark, sf_dir)
    assert_match(df, q.oracle, sf_dir, "crawl_admission")
    rows = {r["doc_id"]: r["status"] for r in df.collect()}
    # one status per doc, statuses from the closed set, priority holds:
    # a doc that is BOTH a url-duplicate and noindex reports url_duplicate
    assert set(rows.values()) <= {"url_duplicate", "robots_noindex",
                                  "known_content", "admitted"}
    # every doc_id % 3 == 0 doc is its own prior -> never 'admitted'
    for d, st in rows.items():
        if d % 3 == 0:
            assert st != "admitted", (d, st)
