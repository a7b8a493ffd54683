"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge training is the canonical tokenizer-building
step of an LLM data pipeline.  The scalable design mirrors production
trainers (SentencePiece / HF tokenizers train on word-frequency tables,
not raw corpora):

- ONE corpus-scale shuffle builds the distinct-word frequency table
  (``word_frequencies``); Zipf makes it orders of magnitude smaller
  than the corpus.
- every merge round then runs on that vocab-sized table: adjacent-pair
  counting is a codegen ``zip_with`` + explode + sum(freq) agg, the
  argmax is a top-1 collect (driver-side by design, like the fixpoint
  CC termination check), and the merge application is a pure
  ``F.aggregate`` fold — greedy left-to-right, the standard BPE
  apply order.
- applying a trained tokenizer to the corpus (``bpe_segment``) again
  tokenizes each DISTINCT word once and broadcast-joins the result back
  onto exploded doc words — per-doc reassembly is an order-preserving
  sort_array(collect_list) agg.  Two appliers share that frame: the
  declarative per-merge fold (the correctness twin, viable to ~16
  merges before the nested expression tree hurts Catalyst) and the
  rank-priority mapInPandas encoder (``segment_words_ranked`` — the
  HF-tokenizers apply loop, ONE plan node at any merge depth, the
  production path for the 30k-merge vocabs ``bpe_train_local`` emits).

Training is inherently eager (a driver loop with one tiny collect per
round) — declared rows-only in the registry and exempted from the
lazy-build guard alongside the pyspark.ml training queries.

Reference parity note: the reference system has no tokenizer surface;
this module belongs to the training-data-pipeline extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-scale
    shuffle; every BPE iteration afterwards is vocab-sized."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(col: str) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    words); overlapping occurrences all count, per standard BPE."""
    s = F.col(col)
    return F.zip_with(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def _apply_merge(col: str | Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) -> left+right
    as a pure fold: a just-merged symbol is not re-merged with the next
    (standard BPE apply semantics)."""
    s = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: null (not ANSI error) on the empty accumulator
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(sym_df: DataFrame) -> DataFrame:
    """(l, r, cnt) adjacent-pair frequencies over a (freq, s) symbol
    table, weighted by word frequency."""
    return (
        sym_df.select("freq", F.explode(_adjacent_pairs("s")).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list [(left, right, pair_count), ...].  Deterministic: ties on
    count break to the lexicographically smallest (left, right).

    EAGER by design (driver merge loop, one top-1 collect per round);
    each round's vocab-sized symbol table is cached and the previous
    round's unpersisted, so lineage stays one round deep.
    """
    cur = (
        word_frequencies(df, text_col)
        .select("freq", F.split("word", "").alias("s"))
        .cache()
    )
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < min_pair_count:
                break
            left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            merges.append((left, right, cnt))
            nxt = cur.select(
                "freq", _apply_merge("s", left, right).alias("s")
            ).cache()
            nxt.count()          # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_train_local(df: DataFrame, n_merges: int = 8, text_col: str = "text",
                    min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges with the corpus-scale stage on Spark
    and the merge loop on the driver — the production shape
    (SentencePiece / HF trainers work the same way): the cluster does the
    ONE corpus-scale shuffle (:func:`word_frequencies`), the Zipf-small
    distinct-word table is collected once, and every merge round is then
    pure local compute with incremental pair-count maintenance.

    Identical output contract to :func:`bpe_train` (ordered
    ``[(left, right, pair_count), ...]``; ties break to the
    lexicographically smallest pair; stops below ``min_pair_count``) —
    asserted merge-for-merge in tests/test_bpe.py — but the per-round cost
    is O(affected words) + O(log n_pairs) instead of a full Spark job, so
    realistic vocab sizes (30k+ merges) train in seconds instead of hours.

    Algorithm: a max-heap of ``(-count, pair)`` with lazy invalidation
    (stale entries are discarded on pop by comparing against the live
    count) gives the argmax; a ``pair -> {word ids}`` index confines each
    round's re-count to the words that actually contain the merged pair.
    """
    rows = word_frequencies(df, text_col).collect()
    table: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["freq"])) for r in rows
    ]
    return _driver_merge_loop(table, n_merges, min_pair_count)


def _driver_merge_loop(table: list[tuple[list[str], int]], n_merges: int,
                       min_pair_count: int) -> list[tuple[str, str, int]]:
    """The shared driver-side merge loop (max-heap with lazy
    invalidation + pair->words index) — used by both the char-level and
    byte-level local trainers so their argmax/tie-break/update semantics
    can never diverge."""
    import heapq
    from collections import Counter, defaultdict

    counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (sym, f) in enumerate(table):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] += f
            where[p].add(wi)
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in counts.items()
    ]
    heapq.heapify(heap)

    def _touch(p: tuple[str, str]) -> None:
        c = counts.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        live = counts.get(best, 0)
        if live != -neg or live == 0:
            continue  # stale heap entry
        if live < min_pair_count:
            break
        left, right = best
        merges.append((left, right, live))
        new_sym = left + right
        touched: set[tuple[str, str]] = set()
        for wi in list(where[best]):
            sym, f = table[wi]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
                where[p].discard(wi)
                touched.add(p)
            out: list[str] = []
            i = 0
            while i < len(sym):  # greedy left-to-right, no re-merge
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            table[wi] = (out, f)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                counts[p] += f
                where[p].add(wi)
                touched.add(p)
        for p in touched:
            _touch(p)
    return merges


def _validate_merge_ranks(merges: list[tuple[str, str, int]]) -> None:
    """Well-formedness check for rank-order application: every multi-char
    merge component must be the product of an EARLIER merge (single chars
    are always valid).  Any list produced by BPE *training* satisfies this
    by construction (a pair can only be counted once both components exist
    as symbols); a hand-crafted list that references a symbol before the
    merge that creates it would make rank-order application diverge from
    sequential application, so it is rejected rather than silently
    mis-encoded."""
    produced: set[str] = set()
    for i, (left, right, _) in enumerate(merges):
        for comp in (left, right):
            if len(comp) > 1 and comp not in produced:
                raise ValueError(
                    f"merge {i} ({left!r}, {right!r}) references symbol "
                    f"{comp!r} before any earlier merge produces it — "
                    "rank-order application requires a trained "
                    "(well-formed) merge list; use method='fold' for "
                    "arbitrary lists"
                )
        produced.add(left + right)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-priority BPE encoding of one word (the GPT-2 / HF-tokenizers
    apply loop): repeatedly merge ALL occurrences of the lowest-rank
    adjacent pair, left-to-right without re-merge, until no ranked pair
    remains.  For a well-formed (trained) merge list this is provably
    identical to applying the merges sequentially in training order —
    merging rank r can only create pairs of rank > r, because any pair
    containing the new symbol as a component must have been trained after
    the merge that produced that symbol — but costs
    O(iterations x word_len) instead of O(n_merges x word_len)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank: int | None = None
        best: tuple[str, str] | None = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (sym[i], sym[i + 1])
        if best is None:
            break
        left, right = best
        out: list[str] = []
        i = 0
        while i < len(sym):  # greedy left-to-right, no re-merge
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def segment_words_ranked(vocab: DataFrame,
                         merges: list[tuple[str, str, int]]) -> DataFrame:
    """(word, symbols) — rank-priority applier over the distinct-word
    vocab: an Arrow-batched ``mapInPandas`` running :func:`_encode_word`
    per word, with the rank dict broadcast by closure (~1 MB at 30k
    merges).  This is the applier that scales to realistic vocab depths:
    the fold twin (:func:`segment_words` ``method="fold"``) builds one
    nested ``F.aggregate`` per merge, so a 30k-merge list means a
    ~30k-deep Catalyst expression tree — analysis cost explodes long
    before data volume matters.  Here the plan is ONE mapInPandas node at
    any depth; per-word cost is the HF-tokenizers loop.  Output is
    asserted token-identical to the fold twin (tests/test_bpe.py), and
    the well-formedness precondition for the equivalence is validated up
    front (:func:`_validate_merge_ranks`)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    _validate_merge_ranks(merges)
    ranks = {(left, right): i for i, (left, right, _) in enumerate(merges)}
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
                "symbols": [_encode_word(w, ranks) for w in pdf["word"]],
            })

    return vocab.select("word").mapInPandas(run, schema)


def segment_words(vocab: DataFrame, merges: list[tuple[str, str, int]],
                  method: str = "auto") -> DataFrame:
    """(word, symbols) — apply the merge list to each DISTINCT word.

    ``method="fold"`` chains one pure ``F.aggregate`` fold per merge in
    training order — fully declarative, the correctness twin, but the
    expression tree grows with the merge count, so it is only viable for
    shallow lists.  ``method="ranked"`` is the scale path
    (:func:`segment_words_ranked`): one Arrow-batched mapInPandas at any
    depth, identical output on trained lists.  ``method="auto"``
    (default) picks fold for lists up to 16 merges (covers the oracle
    twins and arbitrary hand-crafted lists) and ranked above."""
    if method == "auto":
        method = "fold" if len(merges) <= 16 else "ranked"
    if method == "ranked":
        return segment_words_ranked(vocab, merges)
    if method != "fold":
        raise ValueError(f"unknown method {method!r} (auto | fold | ranked)")
    s: Column = F.split("word", "")
    for left, right, _ in merges:
        s = _apply_merge(s, left, right)
    return vocab.select("word", s.alias("symbols"))


def bpe_segment(df: DataFrame, merges: list[tuple[str, str, int]],
                id_col: str = "doc_id",
                text_col: str = "text",
                apply_method: str = "auto") -> DataFrame:
    """Tokenize every doc with a trained merge list.  Each distinct word
    is segmented ONCE (vocab-sized fold) and broadcast-joined back onto
    the exploded doc words; per-doc reassembly keeps word order via a
    sort_array(collect_list(struct(pos, ...))) agg.
    Output: (id_col, n_words, n_bpe_tokens, token_hash) — the md5 of the
    space-joined token stream, a stable fingerprint of the segmentation.
    """
    doc_words = df.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "word")
    ).where(F.length("word") > 0)
    vocab = doc_words.select("word").distinct()
    seg = segment_words(vocab, merges, method=apply_method)
    joined = doc_words.join(F.broadcast(seg), "word")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("symbols")).cast("long").alias("n_bpe_tokens"),
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
    # left-join back so empty/whitespace-only docs keep a row (n = 0, hash
    # of the empty token stream) instead of silently dropping out
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long")
        .alias("n_bpe_tokens"),
        F.coalesce("token_hash", F.md5(F.lit(""))).alias("token_hash"),
    )


def bpe_export(merges: list[tuple[str, str, int]]) -> str:
    """Serialize a trained merge list to a JSON artifact (version-tagged,
    rank-ordered — the interchange shape HF tokenizer.json carries in its
    ``model.merges`` section).  Round-trips exactly via
    :func:`bpe_import` for well-formed (trainer-produced) merge lists;
    a hand-crafted fold-only list that is NOT well-formed serializes fine
    but needs ``bpe_import(..., validate=False)`` to come back (and is
    then safe only with the sequential fold applier, not the
    rank-priority one).  The counts ride along for provenance."""
    import json

    return json.dumps({
        "format": "bpe-merges",
        "version": 1,
        "merges": [{"rank": i, "left": l, "right": r, "count": c}
                   for i, (l, r, c) in enumerate(merges)],
    }, ensure_ascii=False)


def bpe_import(artifact: str,
               validate: bool = True) -> list[tuple[str, str, int]]:
    """Parse a :func:`bpe_export` artifact back to the ordered merge
    list, validating the format tag, rank contiguity, and (by default)
    well-formedness — the property the rank-priority applier
    (:func:`segment_words_ranked`) requires.  Pass ``validate=False`` to
    import a fold-only (non-well-formed) merge list; such a list is safe
    only with the sequential fold applier."""
    import json

    doc = json.loads(artifact)
    if doc.get("format") != "bpe-merges" or doc.get("version") != 1:
        raise ValueError("not a v1 bpe-merges artifact")
    rows = doc["merges"]
    if [m["rank"] for m in rows] != list(range(len(rows))):
        raise ValueError("merge ranks must be contiguous from 0")
    merges = [(m["left"], m["right"], int(m["count"])) for m in rows]
    if validate:
        _validate_merge_ranks(merges)
    return merges


def bpe_vocab(merges: list[tuple[str, str, int]],
              alphabet: list[str] | None = None) -> list[tuple[int, str, str]]:
    """Derive the token vocabulary from a trained merge list — the
    GPT-2 / HF-tokenizers derivation that completes the interchange
    story :func:`bpe_export` / :func:`bpe_import` started: ids
    0..len(alphabet)-1 are the sorted base characters, then one token
    per merge in rank order (token = left || right).  Pass ``alphabet``
    (the corpus character set) for a deployable vocab; by default the
    base set is the characters appearing in the merge components, which
    is sufficient for round-trip validation but smaller than a corpus
    alphabet.  Returns [(token_id, token, kind)] with kind in
    {'char', 'merge'}.

    Closure property (validated): every symbol :func:`_encode_word`
    can emit — single chars and merge products — has an id, so the
    vocab maps any segmentation to ids with no OOV.  Raises on a
    duplicate merge product (impossible for trainer output, possible
    for hand-crafted lists)."""
    chars = (sorted(set(alphabet)) if alphabet is not None
             else sorted({c for l, r, _ in merges for c in l + r}))
    out: list[tuple[int, str, str]] = []
    seen: set[str] = set()
    for i, c in enumerate(chars):
        out.append((i, c, "char"))
        seen.add(c)
    base = len(chars)
    for rank, (l, r, _) in enumerate(merges):
        tok = l + r
        if tok in seen:
            raise ValueError(
                f"merge {rank} product {tok!r} duplicates an existing "
                "token — not a well-formed trained merge list")
        out.append((base + rank, tok, "merge"))
        seen.add(tok)
    return out


def bpe_vocab_export(merges: list[tuple[str, str, int]],
                     alphabet: list[str] | None = None) -> str:
    """Serialize the derived vocab (:func:`bpe_vocab`) to a JSON
    artifact — the ``model.vocab`` half of the HF tokenizer.json shape,
    version-tagged like :func:`bpe_export`.  Round-trips exactly via
    :func:`bpe_vocab_import`."""
    import json

    return json.dumps({
        "format": "bpe-vocab",
        "version": 1,
        "tokens": [{"id": i, "token": t, "kind": k}
                   for i, t, k in bpe_vocab(merges, alphabet)],
    }, ensure_ascii=False)


def bpe_vocab_import(artifact: str) -> list[tuple[int, str, str]]:
    """Parse a :func:`bpe_vocab_export` artifact back to the ordered
    [(token_id, token, kind)] list, validating the format tag, id
    contiguity from 0, and token uniqueness."""
    import json

    doc = json.loads(artifact)
    if doc.get("format") != "bpe-vocab" or doc.get("version") != 1:
        raise ValueError("not a v1 bpe-vocab artifact")
    rows = doc["tokens"]
    if [t["id"] for t in rows] != list(range(len(rows))):
        raise ValueError("token ids must be contiguous from 0")
    toks = [t["token"] for t in rows]
    if len(set(toks)) != len(toks):
        raise ValueError("duplicate tokens in vocab artifact")
    return [(int(t["id"]), t["token"], t["kind"]) for t in rows]


# --- Byte-level mode (GPT-2 posture) -----------------------------------------
# Character-level BPE cannot represent unseen characters; byte-level BPE
# (the GPT-2 / RoBERTa / Llama posture) trains over UTF-8 BYTES mapped
# through a fixed byte<->printable-unicode bijection, so ANY string is
# representable with a 256-symbol base alphabet.  The bijection is the
# standard derivation: printable latin-1 ranges map to themselves, every
# other byte to 256+k in discovery order — no lookup tables beyond what
# the loop below derives.

def bytes_to_unicode() -> dict[int, str]:
    """byte -> unicode char bijection (GPT-2 derivation)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U: dict[int, str] | None = None
_U2B: dict[str, int] | None = None


def _byte_maps() -> tuple[dict[int, str], dict[str, int]]:
    global _B2U, _U2B
    if _B2U is None:
        _B2U = bytes_to_unicode()
        _U2B = {c: b for b, c in _B2U.items()}
    return _B2U, _U2B


def word_to_byte_chars(word: str) -> str:
    """UTF-8 bytes of ``word`` as the mapped printable chars — the
    symbol stream byte-level BPE trains and applies over."""
    b2u, _ = _byte_maps()
    return "".join(b2u[b] for b in word.encode("utf-8"))


def byte_chars_to_word(s: str) -> str:
    """Inverse of :func:`word_to_byte_chars` (exact: the map is a
    bijection and UTF-8 decode round-trips)."""
    _, u2b = _byte_maps()
    return bytes(u2b[c] for c in s).decode("utf-8")


def bpe_train_local_bytes(df: DataFrame, n_merges: int = 8,
                          text_col: str = "text",
                          min_pair_count: int = 2
                          ) -> list[tuple[str, str, int]]:
    """Byte-level twin of :func:`bpe_train_local`: the same ONE
    corpus-scale word-frequency shuffle, with each collected word mapped
    to its byte-char stream before the SHARED driver merge loop — so
    merges are over the 256-symbol byte alphabet and any unicode content
    is trainable.  Output contract unchanged ([(left, right, count)] in
    rank order, byte-char symbols)."""
    rows = word_frequencies(df, text_col).collect()
    table: list[tuple[list[str], int]] = [
        (list(word_to_byte_chars(r["word"])), int(r["freq"])) for r in rows
    ]
    return _driver_merge_loop(table, n_merges, min_pair_count)


def segment_words_ranked_bytes(vocab: DataFrame,
                               merges: list[tuple[str, str, int]]
                               ) -> DataFrame:
    """Byte-level twin of :func:`segment_words_ranked`: each word maps
    to its byte-char stream inside the Arrow batch, then the same
    rank-priority encode loop runs.  Symbols concatenated and mapped
    back ALWAYS reproduce the word exactly (losslessness pytest) — the
    property character-level BPE cannot give on unseen characters."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    _validate_merge_ranks(merges)
    ranks = {(left, right): i for i, (left, right, _) in enumerate(merges)}
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
                "symbols": [
                    _encode_word(word_to_byte_chars(w), ranks)
                    for w in pdf["word"]
                ],
            })

    return vocab.select("word").mapInPandas(run, schema)
