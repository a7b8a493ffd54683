"""Shard packing and stratified sampling semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.sampling import (
    pack_token_shards, stratified_sample)
from simpy__kafka__flink__kafka_spark.plans.dataprep import _q_language_id


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_pack_token_shards_budget_respected(spark, sf_dir):
    budget = 2_000
    packed = pack_token_shards(_docs(spark, sf_dir), budget=budget)
    per_shard = packed.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("max_doc")
    ).collect()
    assert len(per_shard) > 1  # the corpus actually splits
    for r in per_shard:
        # a shard only exceeds the budget by (at most) its straddling doc
        assert r.tok < budget + r.max_doc
    # every doc assigned exactly once
    assert packed.count() == packed.select("doc_id").distinct().count()


def test_pack_token_shards_is_contiguous(spark, sf_dir):
    """Docs are packed in doc_id order: shard_id is monotone in doc_id."""
    rows = pack_token_shards(_docs(spark, sf_dir), budget=2_000) \
        .orderBy("doc_id").select("shard_id").collect()
    ids = [r.shard_id for r in rows]
    assert ids == sorted(ids)


def test_stratified_sample_hits_target_fractions(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    lang = _q_language_id(spark, sf_dir)
    base = docs.join(lang, "doc_id").groupBy("lang_pred").count().collect()
    base_counts = {r.lang_pred: r["count"] for r in base}
    fractions = {k: 0.5 for k in base_counts}
    sampled = stratified_sample(docs, lang, fractions)
    got = sampled.groupBy("lang_pred").count().collect()
    for r in got:
        frac = r["count"] / base_counts[r.lang_pred]
        # md5-uniform tolerance (the draw is a deterministic hash
        # threshold since round 15, not a Bernoulli RNG)
        assert 0.25 <= frac <= 0.75, (r.lang_pred, frac)
    # deterministic under the fixed seed — exact same keep set
    again = stratified_sample(docs, lang, fractions)
    assert again.exceptAll(sampled).count() == 0
    assert again.count() == sampled.count()
    # the seed salts the hash: a different seed draws a different set
    other = stratified_sample(docs, lang, fractions, seed=7)
    assert other.exceptAll(sampled).count() > 0
    # a stratum absent from fractions drops entirely (sampleBy contract)
    none_kept = stratified_sample(
        docs, lang, {"__no_such_lang__": 1.0}).count()
    assert none_kept == 0


def test_span_corruption_plan(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        span_corruption)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(200))) for i in range(40)],
        "doc_id long, text string")
    out = span_corruption(docs).collect()
    got = {r.doc_id: r for r in out}
    assert len(got) == 40
    # corpus-wide masked mass near the 15% objective (deterministic, so
    # this bound is exact and stable, not flaky)
    total = sum(r.n_tokens for r in out)
    masked = sum(r.n_masked for r in out)
    assert 0.10 <= masked / total <= 0.20
    for r in out:
        # every span masks at least one token, at most merging-bounded
        assert 0 <= r.n_spans <= r.n_masked
        if r.n_spans:
            assert r.n_masked >= r.n_spans  # >= 1 token per span
            assert r.n_masked <= r.n_spans * 200
    # determinism: identical on re-run
    again = {r.doc_id: r for r in span_corruption(docs).collect()}
    assert {d: got[d].flags_hash for d in got} == \
        {d: again[d].flags_hash for d in again}
    # no shuffle in the plan
    plan = span_corruption(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_layout(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        pack_sequences)

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100)), (2, " ".join(["w"] * 200)),
         (3, ""), (4, " ".join(["w"] * 300))],
        "doc_id long, text string")
    got = {r.doc_id: r for r in pack_sequences(docs, seq_len=256).collect()}
    # offsets are the exclusive prefix sum in doc order
    assert [got[d].start_offset for d in (1, 2, 3, 4)] == [0, 100, 300, 300]
    # doc 2 spans the 256 boundary; doc 3 (empty) spans nothing
    assert got[1].n_seqs_spanned == 1 and got[1].first_seq == 0
    assert got[2].n_seqs_spanned == 2
    assert got[3].n_seqs_spanned == 0
    # doc 4: tokens 300..599 -> seqs 1 and 2
    assert (got[4].first_seq, got[4].n_seqs_spanned) == (1, 2)
    # conservation: total tokens == max end offset
    assert max(r.start_offset + r.n_tokens for r in got.values()) == 600


def test_leakage_safe_split_keeps_clusters_together(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        leakage_safe_split)

    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the field for quite a while longer") * 2
    rows = [(i, f"unique document number {i} with its own words "
                f"{'filler word ' * 10}{i}") for i in range(20)]
    # a 3-member near-dup cluster spread across ids that would hash to
    # different splits if drawn per-doc
    rows += [(100, base), (101, base.replace("lazy", "sleepy")),
             (102, base.replace("fox", "cat"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in leakage_safe_split(docs).collect()}
    assert set(got) == {r[0] for r in rows}
    # the near-dup trio shares one cluster AND one split
    assert len({got[d].cluster_id for d in (100, 101, 102)}) == 1
    assert len({got[d].split for d in (100, 101, 102)}) == 1
    # singletons cluster as themselves and match salted_split's draw
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        salted_split)

    plain = {r.doc_id: r for r in salted_split(docs).collect()}
    for d in range(20):
        assert got[d].cluster_id == d
        assert got[d].split == plain[d].split


def test_dsir_weights_separates_target_domain(spark):
    """DSIR (Xie et al. 2023): docs sharing the target domain's hashed
    n-gram distribution must score above raw-corpus docs, and the
    default threshold must select the held-out in-domain doc."""
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        dsir_weights)

    target_text = "stream processing with windowed stream joins"
    rows = [
        (1, target_text),                                  # exemplar
        (2, "stream windowed joins stream processing"),    # exemplar
        (3, "windowed joins processing pipeline"),         # in-domain,
        #                                    no 'stream' -> not exemplar
        (4, "cooking pasta with tomato sauce tonight"),
        (5, "gardening tips for winter roses and soil"),
        (6, ""),                                           # empty doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dsir_weights(docs).collect()}
    assert got[1].is_target == 1 and got[4].is_target == 0
    # exemplars and the held-out in-domain doc outrank the off-domain
    assert got[3].log_weight > got[4].log_weight
    assert got[3].log_weight > got[5].log_weight
    # on a ~50-gram toy corpus the add-one smoothing mass (dim
    # pseudo-counts) outweighs every real count, so ALL weights sit
    # below the selected threshold — the w>0 rule only separates at
    # corpus scale (sf0.001 selects ~45%; asserted in oracle parity
    # via the selected column).  Here assert the ordering only.
    assert got[4].selected == 0 and got[5].selected == 0
    # empty doc: zero grams, zero weight, not selected
    assert got[6].n_grams == 0 and got[6].log_weight == 0.0
    assert got[6].selected == 0
    # gram count = unigrams + bigrams = 2n - 1
    assert got[1].n_grams == 2 * 6 - 1


def test_dsir_weights_custom_target_column(spark):
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        dsir_weights)

    rows = [(1, "alpha beta gamma"), (2, "alpha beta delta"),
            (3, "epsilon zeta eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r
           for r in dsir_weights(docs, target=F.col("doc_id") == 1)
           .collect()}
    assert got[1].is_target == 1 and got[2].is_target == 0
    # doc 2 shares 2/3 unigrams + a bigram with the target; doc 3 none
    assert got[2].log_weight > got[3].log_weight


def test_pack_samples_hand_computed(spark):
    """Boundary-respecting greedy over a hand-checkable shard: docs
    never split, an exactly-full sequence closes, a zero-token doc
    rides the open sequence, an over-long doc truncates alone."""
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        pack_samples)

    rows = [(0, "a " * 6), (1, "b " * 4), (2, ""),      # 6+4+0 = full
            (3, "c " * 9),                              # opens seq 1
            (4, "d " * 20)]                             # truncates alone
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        pack_samples(docs, max_len=10, shard_docs=50).collect(),
        key=lambda r: (r["shard_id"], r["seq_idx"]))
    assert [(r["seq_idx"], r["n_docs"], r["tokens_used"],
             r["padding_waste"], r["n_truncated"]) for r in got] == [
        (0, 3, 10, 0, 0),
        (1, 1, 9, 1, 0),
        (2, 1, 10, 0, 1),
    ]
