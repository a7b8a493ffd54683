"""Round-4 corpus operators: passage-level dedup, chunking, PII scrub,
salted split, per-source stats — seeded-fixture semantics checks (the gate
oracle twins cover cross-engine parity; these pin the intended behavior)."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.sampling import salted_split
from simpy__kafka__flink__kafka_spark.functions.text import (
    chunk_documents, passage_dup_summary, passage_rewrite, pii_scrub,
    source_stats)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_passage_dup_summary_flags_shared_blocks(spark):
    shared = " ".join(f"w{i}" for i in range(8))          # one exact 8-block
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    docs = _docs(spark, [
        (1, f"{shared} {uniq_a}"),
        (2, f"{shared} {uniq_b}"),
        (3, uniq_b.replace("b", "c")),
    ])
    got = {r["doc_id"]: (r["n_blocks"], r["n_dup_blocks"])
           for r in passage_dup_summary(docs, w=8).collect()}
    assert got == {1: (2, 1), 2: (2, 1), 3: (1, 0)}


def test_passage_dup_summary_ignores_partial_tail(spark):
    # a 1-word tail fragment shared by chance across docs is NOT a dup
    # passage — only full-w blocks participate in matching
    docs = _docs(spark, [
        (1, " ".join(f"a{i}" for i in range(8)) + " zz"),
        (2, " ".join(f"b{i}" for i in range(8)) + " zz"),
    ])
    got = {r["doc_id"]: (r["n_blocks"], r["n_dup_blocks"])
           for r in passage_dup_summary(docs, w=8).collect()}
    assert got == {1: (2, 0), 2: (2, 0)}


def test_passage_rewrite_keeps_global_first_occurrence(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    docs = _docs(spark, [
        (1, f"{shared} {uniq_a} tail"),
        (2, f"{uniq_b} {shared}"),
        (3, f"{shared} solo"),
    ])
    got = {r["doc_id"]: (r["n_blocks"], r["n_removed"], r["clean_text"])
           for r in passage_rewrite(docs, w=8).collect()}
    assert got[1] == (3, 0, f"{shared} {uniq_a} tail")  # first occurrence kept
    assert got[2] == (2, 1, uniq_b)
    assert got[3] == (2, 1, "solo")  # partial tail always survives


def test_passage_rewrite_removes_repeat_inside_first_doc(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    docs = _docs(spark, [
        (1, f"{shared} {shared}"),  # cross-doc dup repeated in the first doc
        (2, f"{shared} x"),
    ])
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"])
           for r in passage_rewrite(docs, w=8).collect()}
    # exactly ONE occurrence of the shared block survives corpus-wide:
    # (doc 1, block 0); the in-doc repeat and doc 2's copy are both removed
    assert got[1] == (1, shared)
    assert got[2] == (1, "x")


def test_passage_rewrite_within_doc_only_repeats_untouched(spark):
    block = " ".join(f"v{i}" for i in range(8))
    docs = _docs(spark, [
        (1, f"{block} {block}"),  # repeated, but in no OTHER doc
        (2, " ".join(f"u{i}" for i in range(8))),
    ])
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"])
           for r in passage_rewrite(docs, w=8).collect()}
    assert got[1] == (0, f"{block} {block}")
    assert got[2][0] == 0


def test_chunk_documents_window_stride_and_tail(spark):
    # 100 tokens, window 64 stride 48 -> starts 0, 48, 96: 64 + 52 + 4 tokens
    docs = _docs(spark, [(7, " ".join(f"t{i}" for i in range(100)))])
    rows = sorted(chunk_documents(docs, window=64, stride=48).collect(),
                  key=lambda r: r["chunk_idx"])
    assert [(r["chunk_idx"], r["n_tokens"]) for r in rows] == [
        (0, 64), (1, 52), (2, 4)]
    # consecutive chunks overlap by window - stride = 16 tokens
    assert len({r["chunk_hash"] for r in rows}) == 3


def test_chunk_short_doc_single_chunk(spark):
    docs = _docs(spark, [(1, "only three tokens")])
    rows = chunk_documents(docs, window=64, stride=48).collect()
    assert [(r["chunk_idx"], r["n_tokens"]) for r in rows] == [(0, 3)]


def test_pii_scrub_patterns_fire(spark):
    docs = _docs(spark, [
        (1, "mail me at jane.doe+x@corp.example.org today"),
        (2, "ssn 123-45-6789 phone +1 555-867-5309 server 192.168.0.17"),
        (3, "nothing sensitive here"),
    ])
    got = {r["doc_id"]: (r["n_redactions"], r["clean_text"])
           for r in pii_scrub(docs).collect()}
    assert got[1] == (1, "mail me at <EMAIL> today")
    n2, t2 = got[2]
    assert "<SSN>" in t2 and "<PHONE>" in t2 and "<IP>" in t2
    assert "123-45-6789" not in t2 and "192.168.0.17" not in t2
    assert n2 == 3
    assert got[3] == (0, "nothing sensitive here")


def test_pii_scrub_overlap_order(spark):
    # email is applied first, so a dotted alpha-TLD host is eaten whole by
    # the email pattern; an IP-host "email" fails the alpha-TLD requirement
    # and its address falls through to the IPv4 pattern — redacted either way
    docs = _docs(spark, [(1, "a@ex.com then a@10.1.2.3 then 10.1.2.3")])
    r = pii_scrub(docs).collect()[0]
    assert r["clean_text"] == "<EMAIL> then a@<IP> then <IP>"
    assert r["n_redactions"] == 3


def test_salted_split_deterministic_and_proportional(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = salted_split(docs).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1600                  # ~90% of 2000
    assert 40 <= counts["val"] <= 160              # ~5%
    assert 40 <= counts["test"] <= 160
    # same salt -> identical assignment; new salt -> a re-deal
    a = salted_split(docs).collect()
    b = salted_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {r["doc_id"]: r["split"]
         for r in salted_split(docs, salt="v2").collect()}
    moved = sum(1 for r in a if c[r["doc_id"]] != r["split"])
    assert moved > 0


def test_source_stats_counts_within_source_dups(spark):
    rows = [
        (1, "alpha beta", "en", "src_a"),
        (2, "alpha beta", "en", "src_a"),     # exact dup within src_a
        (3, "gamma delta", "de", "src_a"),
        (4, "alpha beta", "en", "src_b"),     # same text, other source: no dup
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {r["source"]: r for r in source_stats(docs).collect()}
    assert got["src_a"]["n_docs"] == 3
    assert got["src_a"]["n_tokens"] == 6
    assert got["src_a"]["n_langs"] == 2
    assert got["src_a"]["n_dup_docs"] == 2
    assert got["src_b"]["n_dup_docs"] == 0


def test_passage_rewrite_identity_when_no_cross_doc_dups(spark):
    # with all-unique blocks the rewrite is the identity on normalized
    # text: nothing removed, reassembly reproduces every doc verbatim
    docs = _docs(spark, [
        (i, " ".join(f"d{i}w{j}" for j in range(20))) for i in range(6)
    ])
    got = {r["doc_id"]: r for r in passage_rewrite(docs, w=8).collect()}
    for i in range(6):
        assert got[i]["n_removed"] == 0
        assert got[i]["clean_text"] == " ".join(
            f"d{i}w{j}" for j in range(20))


def test_phone_pattern_word_bounded(spark):
    # ADVICE r04: the phone regex must not bite a substring out of longer
    # digit/dash runs (ids, serials); real phones still redact
    docs = _docs(spark, [
        (1, "serial 0123-456-78901 stays intact"),
        (2, "call 555-867-5309 now"),
    ])
    got = {r["doc_id"]: r["clean_text"] for r in pii_scrub(docs).collect()}
    assert got[1] == "serial 0123-456-78901 stays intact"
    assert got[2] == "call <PHONE> now"


def test_contamination_overlap_ratio_semantics(spark):
    # bench doc 0 has distinct 8-grams; doc 1 reproduces ALL of its text
    # (ratio 1.0); doc 2 shares only one 8-gram window worth (< 0.2 of the
    # bench grams) and must NOT be flagged at min_ratio=0.2
    from simpy__kafka__flink__kafka_spark.functions.text import (
        contamination_overlap)

    bench_text = " ".join(f"w{i}" for i in range(20))        # 13 8-grams
    partial = " ".join(f"w{i}" for i in range(8)) + " " + \
        " ".join(f"z{i}" for i in range(30))                  # 1 shared gram
    docs = spark.createDataFrame(
        [(0, bench_text), (1, "prefix " + bench_text + " suffix"),
         (2, partial), (3, " ".join(f"q{i}" for i in range(25)))],
        "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): r for r in
           contamination_overlap(docs, n=8, bench_mod=10,
                                 min_ratio=0.2).collect()}
    assert (1, 0) in got
    assert got[(1, 0)].n_shared == 13
    assert got[(1, 0)].overlap_ratio == 1.0
    assert all(d != 2 for d, _ in got)   # below threshold
    assert all(d != 3 for d, _ in got)   # no overlap at all


def test_rare_bigram_rate_counts(spark):
    # "a b" occurs 3x corpus-wide (not rare at max_count=2); every other
    # bigram occurs once (rare)
    from simpy__kafka__flink__kafka_spark.functions.text import (
        rare_bigram_rate)

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a b"), (4, "solo"), (5, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           rare_bigram_rate(docs, max_count=2).collect()}
    # doc 1: bigrams (a b), (b c) -> 1 rare of 2
    assert (got[1].n_bigrams, got[1].n_rare, got[1].rare_rate) == (2, 1, 0.5)
    assert (got[2].n_bigrams, got[2].n_rare) == (2, 1)
    assert (got[3].n_bigrams, got[3].n_rare, got[3].rare_rate) == (1, 0, 0.0)
    # keep-empty contract (round 7, matching bpe_segment): docs with <2
    # words keep a (0, 0, 0.0) row instead of dropping out
    assert set(got) == {1, 2, 3, 4, 5}
    for d in (4, 5):
        assert (got[d].n_bigrams, got[d].n_rare, got[d].rare_rate) == \
            (0, 0, 0.0)


def test_profile_table_semantics(spark):
    import datetime as _dt

    from simpy__kafka__flink__kafka_spark.functions.profiling import (
        profile_table)

    rows = [
        (1, "a", 1.5, _dt.datetime(2024, 1, 1)),
        (2, "b", None, _dt.datetime(2024, 1, 2)),
        (3, None, 2.5, None),
        (3, "a", 2.5, _dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "k long, s string, x double, t timestamp_ntz")
    got = {r.column: r for r in profile_table(
        df, numeric_cols=["k", "x"], string_cols=["s"],
        ts_cols=["t"]).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 0
    assert got["k"].n_distinct == 3
    assert (got["k"].min_num, got["k"].max_num) == (1.0, 3.0)
    assert got["x"].n_nulls == 1 and got["x"].n_distinct == 2
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_str, got["s"].max_str) == ("a", "b")
    assert got["s"].min_num is None
    assert got["t"].n_nulls == 1 and got["t"].n_distinct == 2
    assert got["t"].min_num == 1704067200000.0  # 2024-01-01 UTC epoch ms
