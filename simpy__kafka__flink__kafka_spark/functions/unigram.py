"""Unigram-LM tokenizer — the SentencePiece-family counterpart to BPE
(Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates"): a vocabulary of
subword pieces with probabilities, trained by EM over the corpus and
applied by per-word Viterbi segmentation (the max-probability piece
sequence).

Scale posture mirrors ``functions/bpe.py`` exactly: the cluster does the
ONE corpus-scale shuffle (the distinct-word frequency table, Zipf-small),
training runs driver-side over the collected table (how SentencePiece
itself trains — on a word-frequency file, not the raw corpus), and
application Viterbi-segments each DISTINCT word once inside an
Arrow-batched ``mapInPandas`` with the piece table broadcast by closure,
then broadcast-joins back onto the exploded corpus.

Training is a faithful simplification of the SentencePiece recipe:
seed vocabulary = all substrings up to ``max_piece_len`` weighted by
occurrence frequency (top ``seed_size``), then alternating EM rounds
(E: Viterbi-count pieces under current probabilities; M: re-normalize)
with pruning of the least-used pieces down to ``vocab_size`` —
single-character pieces are never pruned, so every word stays
segmentable.  Corpus log-likelihood is non-decreasing across EM rounds
(pytest-asserted), the structural property that makes this EM and not
just counting.  Probabilities are driver-side floats; like BPE training
this is rows-only territory (iterative, not SQL-expressible) — the
APPLICATION output (piece streams) is deterministic given the trained
table and pytest-pinned against a pure-Python reference Viterbi.

Reference parity note: the reference system has no tokenizer surface;
this module belongs to the training-data extension operators.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .bpe import word_frequencies


def _viterbi(word: str, logp: dict[str, float],
             max_len: int) -> list[str]:
    """Max-probability segmentation of ``word`` into vocab pieces.
    Assumes every single char of the word is in ``logp`` (guaranteed for
    trainer output on its own corpus); unseen single chars fall back to
    a large penalty so application never fails."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    unk = -100.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_train(df: DataFrame, vocab_size: int = 200,
                  text_col: str = "text", max_piece_len: int = 6,
                  seed_size: int = 2000, em_rounds: int = 2,
                  ) -> tuple[list[tuple[str, float]], list[float]]:
    """Train a unigram-LM piece vocabulary.  Returns (pieces, ll_curve):
    ``pieces`` = [(piece, prob)] sorted by piece, probs summing to 1;
    ``ll_curve`` = corpus log-likelihood after each EM round
    (non-decreasing — asserted by the caller's tests, returned so they
    can).  EAGER by design (the collect of the word table IS the
    algorithm), like bpe_train_local."""
    rows = word_frequencies(df, text_col).collect()
    freqs: list[tuple[str, int]] = [(r["word"], int(r["freq"]))
                                    for r in rows]

    # seed: substring frequencies (chars always kept)
    from collections import Counter

    sub_counts: Counter = Counter()
    for w, f in freqs:
        n = len(w)
        for j in range(n):
            for i in range(j + 1, min(j + max_piece_len, n) + 1):
                sub_counts[w[j:i]] += f
    chars = {p for p in sub_counts if len(p) == 1}
    multi = sorted(
        (p for p in sub_counts if len(p) > 1),
        key=lambda p: (-sub_counts[p] * len(p), p),
    )[:seed_size]
    vocab = chars | set(multi)

    def normalize(counts: dict[str, float]) -> dict[str, float]:
        total = sum(counts.values())
        return {p: math.log(c / total) for p, c in counts.items() if c > 0}

    logp = normalize({p: float(sub_counts[p]) for p in vocab})
    ll_curve: list[float] = []
    for rnd in range(em_rounds):
        # E-step: Viterbi counts (hard EM — the SentencePiece default
        # final rounds) + corpus log-likelihood under current probs
        counts: Counter = Counter()
        ll = 0.0
        for w, f in freqs:
            seg = _viterbi(w, logp, max_piece_len)
            for p in seg:
                counts[p] += f
            ll += f * sum(logp.get(p, -100.0) for p in seg)
        ll_curve.append(ll)
        # prune to vocab_size before the last round: drop the
        # least-used multi-char pieces (chars are never pruned)
        keep = chars | set(
            p for p, _ in sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:max(0, vocab_size - len(chars))]
        )
        counts = Counter({p: c for p, c in counts.items() if p in keep})
        for c in chars:                 # keep chars alive even at 0 use
            counts[c] = max(counts[c], 1)
        logp = normalize(dict(counts))
    pieces = sorted((p, math.exp(lp)) for p, lp in logp.items())
    return pieces, ll_curve


def unigram_segment(df: DataFrame, pieces: list[tuple[str, float]],
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Tokenize every doc with a trained piece table: each DISTINCT word
    Viterbi-segmented once in Arrow ``mapInPandas`` (piece log-probs
    broadcast by closure), broadcast-joined back onto exploded doc
    words, order-preserving reassembly — the bpe_segment shape.
    Output: (id_col, n_words, n_pieces, token_hash)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .text import words

    logp = {p: math.log(pr) for p, pr in pieces if pr > 0}
    max_len = max((len(p) for p in logp), default=1)
    schema = T.StructType([
        T.StructField("word", T.StringType(), False),
        T.StructField("symbols", T.ArrayType(T.StringType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame({
                "word": pdf["word"],
                "symbols": [_viterbi(w, logp, max_len)
                            for w in pdf["word"]],
            })

    doc_words = df.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "word")
    ).where(F.length("word") > 0)
    vocab = doc_words.select("word").distinct()
    seg = vocab.mapInPandas(run, schema)
    joined = doc_words.join(F.broadcast(seg), "word")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("symbols")).cast("long").alias("n_pieces"),
        F.md5(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "symbols"))
                        ),
                        lambda st: st["symbols"],
                    )
                ),
            )
        ).alias("token_hash"),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce("token_hash", F.md5(F.lit(""))).alias("token_hash"),
    )
