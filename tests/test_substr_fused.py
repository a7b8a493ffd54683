"""Fused ExactSubstr profile+rewrite: column-for-column equality with the
two standalone operators, plus the combined registry row's oracle."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.text import (
    exact_substring_profile_and_rewrite, exact_substring_rewrite,
    exact_substring_spans)

PAYLOAD = "the shared payload sentence that is well over thirty characters"


def _docs(spark):
    rows = [
        (1, f"unique alpha text one {PAYLOAD} tail alpha"),
        (2, f"unique beta text two {PAYLOAD} tail beta"),
        (3, f"{PAYLOAD} leading copy in doc three {PAYLOAD}"),
        (4, "entirely unique document with no duplication at all here"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fused_equals_standalone_pair(spark):
    docs = _docs(spark)
    fused = {r["doc_id"]: r for r in
             exact_substring_profile_and_rewrite(docs, min_len=30).collect()}
    prof = {r["doc_id"]: r for r in
            exact_substring_spans(docs, min_len=30).collect()}
    rew = {r["doc_id"]: r for r in
           exact_substring_rewrite(docs, min_len=30).collect()}
    assert set(fused) == set(prof) == set(rew) == {1, 2, 3, 4, 5}
    for did in fused:
        f = fused[did]
        assert f["doc_len"] == prof[did]["doc_len"] == rew[did]["doc_len"]
        assert f["n_dup_spans"] == prof[did]["n_dup_spans"]
        assert f["dup_chars"] == prof[did]["dup_chars"]
        assert f["n_removed_spans"] == rew[did]["n_removed_spans"]
        assert f["removed_chars"] == rew[did]["removed_chars"]
        assert f["clean_text"] == rew[did]["clean_text"]
    # semantics spot-checks: doc 1 keeps the payload (first occurrence),
    # docs 2/3 lose it; doc 4/5 untouched
    assert PAYLOAD in fused[1]["clean_text"]
    assert PAYLOAD not in fused[2]["clean_text"]
    assert PAYLOAD not in fused[3]["clean_text"]
    assert fused[4]["n_dup_spans"] == 0
    assert fused[4]["clean_text"] == fused[4]["clean_text"].strip()
    assert fused[5]["doc_len"] < 30 and fused[5]["n_dup_spans"] == 0


def test_fused_single_gram_exchange(spark):
    # plan audit: both per-doc tails must read the gram-windowed hit set
    # through ONE InMemoryRelation (the cache that makes the expensive
    # position-stream window execute once; the wall-clock proof is the
    # fusion A/B in experiments/substr_scale.py)
    docs = _docs(spark)
    df = exact_substring_profile_and_rewrite(docs, min_len=30)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    # exactly one distinct doc-side window per tail (profile + rewrite),
    # and the two InMemoryRelation references share one cached plan id
    import re

    cache_ids = set(re.findall(r"CachedRDDBuilder.*?(rdd_\d+)", plan)) or {
        "shared"}
    assert len(cache_ids) == 1
