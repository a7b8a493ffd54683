"""Unigram-LM tokenizer (functions/unigram.py): EM monotonicity, Viterbi
optimality vs brute force, losslessness, and the registry row."""

from __future__ import annotations

import itertools
import math

from simpy__kafka__flink__kafka_spark.functions.unigram import (
    _viterbi, unigram_segment, unigram_train)

CORPUS = ("the quick brown fox jumps over the lazy dog and the "
          "quick brown cat naps beside the lazy dog ")


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_em_loglik_non_decreasing(spark):
    docs = _mkdocs(spark, [CORPUS * 4, CORPUS[::-1] * 2])
    pieces, ll = unigram_train(docs, vocab_size=80, em_rounds=4)
    assert len(ll) == 4
    assert all(ll[i + 1] >= ll[i] - 1e-9 for i in range(3)), ll
    # probabilities normalize
    assert abs(sum(p for _, p in pieces) - 1.0) < 1e-9
    # single chars survive pruning (full coverage)
    chars = {p for p, _ in pieces if len(p) == 1}
    assert set("thequickbrownfox") <= chars | {" "}


def test_viterbi_is_optimal_vs_bruteforce():
    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
            "ba": math.log(0.15), "aba": math.log(0.1)}

    def brute(word):
        best, best_lp = None, -math.inf
        n = len(word)
        for cuts in range(2 ** (n - 1)):
            segs, start = [], 0
            for i in range(n - 1):
                if cuts >> i & 1:
                    segs.append(word[start:i + 1])
                    start = i + 1
            segs.append(word[start:])
            if all(s in logp for s in segs):
                lp = sum(logp[s] for s in segs)
                if lp > best_lp:
                    best, best_lp = segs, lp
        return best, best_lp

    for word in ("ab", "aba", "abab", "ababa", "baab"):
        got = _viterbi(word, logp, 3)
        want, want_lp = brute(word)
        got_lp = sum(logp[s] for s in got)
        assert abs(got_lp - want_lp) < 1e-12, (word, got, want)


def test_segmentation_lossless_and_deterministic(spark):
    docs = _mkdocs(spark, [CORPUS * 3])
    pieces, _ = unigram_train(docs, vocab_size=60)
    logp = {p: math.log(pr) for p, pr in pieces}
    ml = max(len(p) for p in logp)
    for w in ("quick", "lazy", "unseenword"):
        seg = _viterbi(w, logp, ml)
        assert "".join(seg) == w            # lossless, even OOV words
    a = unigram_segment(docs, pieces).collect()
    b = unigram_segment(docs, pieces).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_registry_row(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["unigram_tokenize"]
    assert q.oracle is None  # rows-only by the iterative-training policy
    rows = q.build(spark, sf_dir).collect()
    assert rows
    assert all(r["n_pieces"] >= r["n_words"] or r["n_words"] == 0
               for r in rows)
