"""Skew-salting correctness + MinHash-LSH recall on planted near-duplicates."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs)
from simpy__kafka__flink__kafka_spark.operators.skew import (salted_agg,
                                                             salted_count)


def test_salted_count_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {r.l_returnflag: r.n for r in
             li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.l_returnflag: r.n for r in
              salted_count(li, "l_returnflag").collect()}
    assert plain == salted


def test_salted_sum_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.sum(F.floor(F.col("l_quantity") * 100).cast("long"))
    plain = {r.l_returnflag: r.s for r in
             li.groupBy("l_returnflag").agg(cents.alias("s")).collect()}
    salted = {r.l_returnflag: r.s for r in
              salted_agg(li, "l_returnflag", cents, F.sum("_partial"),
                         "s").collect()}
    assert plain == salted


def _planted_corpus(spark):
    """40 base docs + 10 near-dup pairs (one word substituted)."""
    rng = random.Random(7)
    vocab = ["join", "scan", "merge", "sort", "filter", "window", "group",
             "hash", "batch", "stream", "table", "query", "spark", "row"]
    docs, dups = [], []
    did = 0
    for i in range(40):
        text = " ".join(rng.choice(vocab) for _ in range(60))
        docs.append((did, text)); did += 1
    for i in range(10):
        base_words = [rng.choice(vocab) for _ in range(60)]
        a = " ".join(base_words)
        mutated = list(base_words)
        mutated[30] = "MUTANT"
        b = " ".join(mutated)
        docs.append((did, a)); docs.append((did + 1, b))
        dups.append((did, did + 1)); did += 2
    return spark.createDataFrame(docs, "doc_id long, text string"), set(dups)


def test_minhash_lsh_finds_planted_near_dups(spark):
    corpus, dups = _planted_corpus(spark)
    candidates = {(r.doc_a, r.doc_b)
                  for r in minhash_lsh_pairs(corpus).collect()}
    found = dups & candidates
    # one-word edits share ~95% of shingles; LSH banding must surface most
    assert len(found) >= 8, (len(found), sorted(dups - candidates))
    # and exact Jaccard verification confirms them as true near-dups
    verified = {(r.doc_a, r.doc_b)
                for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert dups <= verified


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join must be row-for-row equivalent to the plain equi-join on a
    genuinely skewed key (l_returnflag: 3 values over the whole table)."""
    from simpy__kafka__flink__kafka_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "normal")],
        "l_returnflag string, label string",
    )
    got = salted_join(li, dim, "l_returnflag")
    want = li.join(dim, "l_returnflag")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_near_dup_clusters_chain_and_clique(spark):
    """Min-label propagation: a 3-chain and a separate pair resolve to their
    component minima."""
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        near_dup_clusters)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_local_minhash_signatures_match_grouped(spark, sf_dir):
    # the row-local fold (zero-shuffle cluster-scale option) must produce
    # byte-identical signatures to the groupBy form, including dropping
    # shingle-less docs
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        minhash_lsh_pairs, minhash_signatures, minhash_signatures_local)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    a = sorted(map(tuple, minhash_signatures(docs).collect()))
    b = sorted(map(tuple, minhash_signatures_local(docs).collect()))
    assert a == b
    pa = sorted(map(tuple, minhash_lsh_pairs(docs).collect()))
    pb = sorted(map(tuple, minhash_lsh_pairs(docs, local=True).collect()))
    assert pa == pb


def test_local_minhash_drops_shingleless_docs(spark):
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        minhash_signatures, minhash_signatures_local)

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "three words here now"), (3, "")],
        "doc_id long, text string")
    a = sorted(map(tuple, minhash_signatures(docs).collect()))
    b = sorted(map(tuple, minhash_signatures_local(docs).collect()))
    assert a == b
    assert [r[0] for r in b] == [2]  # docs 1 and 3 have no 3-gram shingles
