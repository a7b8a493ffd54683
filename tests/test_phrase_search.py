"""phrase_search golden semantics: anchor-vote algebra must reproduce
positional-index phrase matching — overlapping occurrences, repeated
phrase terms, and bag-of-words false friends (all terms present but not
contiguous) are the cases an L-way join gets wrong first."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.text import phrase_search


def _run(spark, rows, phrase):
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = phrase_search(df, phrase)
    return {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
            for r in out.collect()}


def test_basic_and_negative(spark):
    got = _run(spark, [
        (1, "the quick brown fox"),
        (2, "quick the brown fox"),       # both terms, wrong order
        (3, "the quick and the quick brown"),  # second occurrence only
        (4, "quick brown"),               # missing leading term
    ], ["the", "quick", "brown"])
    assert got == {1: (1, 0), 3: (1, 3)}


def test_repeated_term_phrase(spark):
    got = _run(spark, [
        (1, "batch batch stream"),
        (2, "batch stream"),              # only one 'batch'
        (3, "batch batch batch stream"),  # match at offset 1 only
        (4, "stream batch batch"),        # wrong order
    ], ["batch", "batch", "stream"])
    assert got == {1: (1, 0), 3: (1, 1)}


def test_overlapping_occurrences_counted(spark):
    # "a a a a" contains "a a" at anchors 0,1,2 — positional semantics
    got = _run(spark, [(1, "a a a a")], ["a", "a"])
    assert got == {1: (3, 0)}


def test_normalization_matches_tokenizer(spark):
    # mixed case + runs of whitespace collapse before positions assign
    got = _run(spark, [(1, "  The   QUICK brown  ")], ["the", "quick"])
    assert got == {1: (1, 0)}


def test_single_term_phrase(spark):
    got = _run(spark, [(1, "x y x"), (2, "y")], ["x"])
    assert got == {1: (2, 0)}
