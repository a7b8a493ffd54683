"""Distributed BPE training/application vs a pure-Python reference
trainer: merge order (incl. deterministic tie-breaks), greedy-left apply
semantics, corpus segmentation with order-preserving reassembly, the
min-count stop, the registry row, and the driver-local trainer
(bpe_train_local) asserted merge-for-merge identical to both the
distributed twin and the reference."""

from __future__ import annotations

import hashlib
from collections import Counter

from simpy__kafka__flink__kafka_spark.functions.bpe import (
    bpe_segment, bpe_train, bpe_train_local, segment_words,
    segment_words_ranked, word_frequencies)
from simpy__kafka__flink__kafka_spark.plans import registry

CLASSIC = ("low low low low low lower lower newest newest newest newest "
           "newest newest widest widest widest")


def _ref_apply(sym: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int,
             min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += f
        if not counts:
            break
        best_cnt = max(counts.values())
        if best_cnt < min_pair_count:
            break
        left, right = min(k for k, v in counts.items() if v == best_cnt)
        merges.append((left, right, best_cnt))
        vocab = {_ref_apply(s, left, right): f for s, f in vocab.items()}
    return merges


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_matches_reference_on_classic_corpus(spark):
    docs = _mkdocs(spark, [(1, CLASSIC)])
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert bpe_train(docs, n_merges=8) == _ref_bpe(freqs, 8)


def test_bpe_tie_break_is_lexicographic(spark):
    # "ab" and "cd" each appear 3 times -> (a,b) wins the tie
    docs = _mkdocs(spark, [(1, "ab ab ab cd cd cd")])
    merges = bpe_train(docs, n_merges=1)
    assert merges == [("a", "b", 3)]


def test_apply_is_greedy_left_without_remerge(spark):
    # "aaab": greedy left merges positions 0-1 then cannot re-merge the
    # new "aa" with the following "a"
    docs = _mkdocs(spark, [(1, "aaab aaab")])
    vocab = word_frequencies(docs).select("word").distinct()
    seg = segment_words(vocab, [("a", "a", 0)])
    assert seg.collect()[0]["symbols"] == ["aa", "a", "b"]


def test_min_pair_count_stops_training(spark):
    docs = _mkdocs(spark, [(1, "xy")])  # every pair occurs once
    assert bpe_train(docs, n_merges=4, min_pair_count=2) == []


def test_segment_reassembles_in_word_order(spark):
    docs = _mkdocs(spark, [(1, CLASSIC), (2, "low lower newest widest newest")])
    merges = bpe_train(docs, n_merges=8)
    got = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    # reproduce doc 2's token stream with the reference applier
    toks: list[str] = []
    for w in "low lower newest widest newest".split():
        sym = tuple(w)
        for left, right, _ in merges:
            sym = _ref_apply(sym, left, right)
        toks.extend(sym)
    assert got[2]["n_words"] == 5
    assert got[2]["n_bpe_tokens"] == len(toks)
    expect = hashlib.md5(" ".join(toks).encode()).hexdigest()
    assert got[2]["token_hash"] == expect
    assert got[1]["n_words"] == 16


def test_local_trainer_matches_reference_on_classic_corpus(spark):
    docs = _mkdocs(spark, [(1, CLASSIC)])
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert bpe_train_local(docs, n_merges=8) == _ref_bpe(freqs, 8)


def test_local_trainer_matches_distributed_twin(spark):
    docs = _mkdocs(spark, [(1, CLASSIC), (2, "wide wider widest low lowest"),
                           (3, "newest news new lower lowest")])
    assert bpe_train_local(docs, n_merges=12) == bpe_train(docs, n_merges=12)


def test_local_trainer_deep_merges_match_reference(spark):
    # deep merge chain on a synthetic corpus: exercises the lazy-heap
    # invalidation path (counts rise and fall across rounds) well past the
    # distributed twin's practical depth
    import random

    rng = random.Random(11)
    ws = ["".join(rng.choices("abcdef", k=rng.randint(2, 9)))
          for _ in range(300)]
    text = " ".join(rng.choice(ws) for _ in range(3000))
    docs = _mkdocs(spark, [(1, text)])
    freqs = Counter(text.split())
    got = bpe_train_local(docs, n_merges=200, min_pair_count=2)
    assert got == _ref_bpe(dict(freqs), 200)
    assert len(got) > 50  # the corpus genuinely sustains a deep chain


def test_local_trainer_tie_break_and_stop(spark):
    docs = _mkdocs(spark, [(1, "ab ab ab cd cd cd")])
    assert bpe_train_local(docs, n_merges=1) == [("a", "b", 3)]
    assert bpe_train_local(_mkdocs(spark, [(1, "xy")]), n_merges=4,
                           min_pair_count=2) == []


def test_bpe_merges_registry_row(spark, sf_dir):
    q = registry()["bpe_merges"]
    assert q.oracle is None  # rows-only by design (iterative training)
    out = q.build(spark, sf_dir).collect()
    assert 0 < len(out) <= 8
    assert [r["rank"] for r in out] == list(range(len(out)))
    assert all(r["pair_count"] >= 2 for r in out)


def test_ranked_applier_matches_fold_applier(spark):
    # the scale applier (mapInPandas rank-priority loop) must be
    # token-identical to the declarative fold twin on a trained list
    docs = _mkdocs(spark, [(1, CLASSIC), (2, "wide wider widest low lowest"),
                           (3, "newest news new lower lowest")])
    merges = bpe_train_local(docs, n_merges=8)
    vocab = word_frequencies(docs).select("word").distinct()
    fold = {r["word"]: r["symbols"]
            for r in segment_words(vocab, merges, method="fold").collect()}
    ranked = {r["word"]: r["symbols"]
              for r in segment_words(vocab, merges, method="ranked").collect()}
    assert fold == ranked


def test_ranked_applier_deep_merges_match_reference(spark):
    # realistic-depth list (well past the fold applier's viability):
    # rank-priority encoding must equal sequential application of the
    # full trained list, word for word
    import random

    rng = random.Random(7)
    ws = ["".join(rng.choices("abcdefgh", k=rng.randint(2, 10)))
          for _ in range(400)]
    text = " ".join(rng.choice(ws) for _ in range(4000))
    docs = _mkdocs(spark, [(1, text)])
    merges = bpe_train_local(docs, n_merges=300, min_pair_count=2)
    assert len(merges) > 100  # the corpus genuinely sustains depth
    vocab = word_frequencies(docs).select("word").distinct()
    got = {r["word"]: tuple(r["symbols"])
           for r in segment_words_ranked(vocab, merges).collect()}
    for w in set(text.split()):
        sym = tuple(w)
        for left, right, _ in merges:
            sym = _ref_apply(sym, left, right)
        assert got[w] == sym, w


def test_ranked_applier_rejects_ill_formed_list(spark):
    import pytest

    docs = _mkdocs(spark, [(1, "abc abc")])
    vocab = word_frequencies(docs).select("word").distinct()
    # "ab" referenced at rank 0 but only produced at rank 1 — rank-order
    # application would diverge from sequential; must be rejected
    bad = [("ab", "c", 0), ("a", "b", 0)]
    with pytest.raises(ValueError, match="before any earlier merge"):
        segment_words_ranked(vocab, bad)
    # the fold applier handles the same list fine (sequential semantics)
    rows = {r["word"]: r["symbols"]
            for r in segment_words(vocab, bad, method="fold").collect()}
    assert rows["abc"] == ["ab", "c"]


def test_bpe_tokenize_registry_row_deep_vocab(spark, sf_dir):
    # the registry row now trains up to 1,000 merges and applies them with
    # the ranked encoder — one row per doc, fingerprints non-trivial
    q = registry()["bpe_tokenize"]
    assert q.oracle is None  # rows-only by design (depends on training)
    out = q.build(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r["n_bpe_tokens"] >= 1 for r in rows if r["n_words"] > 0)
    # merged symbols exist: token stream strictly shorter than char count
    assert any(r["n_bpe_tokens"] < r["n_words"] * 4 for r in rows)


def test_segment_keeps_empty_docs(spark):
    import hashlib as _h
    docs = _mkdocs(spark, [(1, "low lower"), (2, "   "), (3, "")])
    merges = bpe_train(docs, n_merges=2, min_pair_count=1)
    got = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[2]["n_words"], got[2]["n_bpe_tokens"]) == (0, 0)
    assert got[3]["token_hash"] == _h.md5(b"").hexdigest()


def test_export_import_roundtrip(spark):
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        bpe_export, bpe_import)

    docs = _mkdocs(spark, [(1, CLASSIC)])
    merges = bpe_train_local(docs, n_merges=8)
    art = bpe_export(merges)
    assert bpe_import(art) == merges
    # tokenization through the re-imported artifact is identical
    a = {r["doc_id"]: r["token_hash"]
         for r in bpe_segment(docs, merges).collect()}
    b = {r["doc_id"]: r["token_hash"]
         for r in bpe_segment(docs, bpe_import(art)).collect()}
    assert a == b
    with pytest.raises(ValueError, match="artifact"):
        bpe_import('{"format": "other"}')
    with pytest.raises(ValueError, match="contiguous"):
        bpe_import('{"format": "bpe-merges", "version": 1, "merges": '
                   '[{"rank": 2, "left": "a", "right": "b", "count": 3}]}')


def test_bpe_vocab_derivation_and_roundtrip(spark):
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        _encode_word, bpe_train_local, bpe_vocab, bpe_vocab_export,
        bpe_vocab_import)

    docs = _mkdocs(spark, [(1, CLASSIC)])
    merges = bpe_train_local(docs, n_merges=8)
    vocab = bpe_vocab(merges)
    # ids contiguous; chars first (sorted), then merge products in rank order
    assert [i for i, _, _ in vocab] == list(range(len(vocab)))
    chars = [t for _, t, k in vocab if k == "char"]
    assert chars == sorted(chars)
    prods = [t for _, t, k in vocab if k == "merge"]
    assert prods == [l + r for l, r, _ in merges]
    # artifact round-trip
    assert bpe_vocab_import(bpe_vocab_export(merges)) == vocab
    # explicit corpus alphabet widens the char section, ids stay contiguous
    v2 = bpe_vocab(merges, alphabet=list("abcdefghijklmnopqrstuvwxyz"))
    assert [i for i, _, _ in v2] == list(range(len(v2)))
    assert len([t for _, t, k in v2 if k == "char"]) == 26
    # closure: with a corpus alphabet, every symbol the rank-priority
    # encoder can emit has an id (the default merge-chars alphabet only
    # guarantees this for words over the merge components)
    tokens = {t for _, t, _ in v2}
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    for word in ("low", "lowest", "newer", "wider"):
        assert set(_encode_word(word, ranks)) <= tokens
    # duplicate merge product rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicates"):
        bpe_vocab([("a", "b", 3), ("a", "b", 2)])


def test_bpe_vocab_registry_row(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.plans import registry

    rows = registry()["bpe_vocab"].build(spark, sf_dir).collect()
    assert rows
    ids = sorted(r["token_id"] for r in rows)
    assert ids == list(range(len(rows)))
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"char", "merge"}
    assert sum(1 for r in rows if r["kind"] == "merge") == 8


def test_byte_level_bijection_and_roundtrip():
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        byte_chars_to_word, bytes_to_unicode, word_to_byte_chars)

    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable ascii maps to itself; control bytes map above 255
    assert m[ord("a")] == "a" and ord(m[0]) >= 256
    for w in ("hello", "café", "naïve", "日本語", "mixed ünïcødé",
              "tab\tand\nnewline"):
        assert byte_chars_to_word(word_to_byte_chars(w)) == w


def test_byte_level_trainer_matches_char_level_on_ascii(spark):
    # on pure-ascii input the byte-char stream IS the char stream, so
    # the two trainers must emit identical merge lists
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        bpe_train_local, bpe_train_local_bytes)

    docs = _mkdocs(spark, [(1, CLASSIC)])
    assert bpe_train_local_bytes(docs, n_merges=8) == \
        bpe_train_local(docs, n_merges=8)


def test_byte_level_segmentation_lossless_on_unicode(spark):
    # the property char-level BPE cannot give: unseen unicode content
    # segments losslessly (symbols decode back to the exact word)
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        bpe_train_local_bytes, byte_chars_to_word,
        segment_words_ranked_bytes)

    docs = spark.createDataFrame(
        [(1, "café déjà vu café déjà bleu café déjà über")],
        "doc_id long, text string")
    merges = bpe_train_local_bytes(docs, n_merges=6)
    assert merges
    vocab = spark.createDataFrame(
        [("café",), ("déjà",), ("über",), ("unseen日本語",)],
        "word string")
    got = {r["word"]: r["symbols"]
           for r in segment_words_ranked_bytes(vocab, merges).collect()}
    for word, syms in got.items():
        assert byte_chars_to_word("".join(syms)) == word
    # trained pairs actually merged (the repeated words compress)
    assert len(got["café"]) < len("café".encode("utf-8"))
