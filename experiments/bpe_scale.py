"""Scale characterization of BPE training: per-round cost is vocab-bound,
not corpus-bound.  An id-shifted N-copy corpus multiplies corpus size by
N while leaving the DISTINCT-word table identical (only frequencies
scale), so after the single corpus-scale word-count shuffle every merge
round should cost the same — and produce the same merges with N-scaled
pair counts.

Also A/Bs the driver-local trainer (bpe_train_local — one Spark shuffle,
then a local incremental merge loop) against the distributed-round twin:
identical merge sequence required; the local path must amortize the merge
loop to near-zero per round so realistic vocab depths (1000+ merges)
train in seconds.

    python experiments/bpe_scale.py [--copies 10] [--merges 8]
                                    [--deep-merges 1000]
                                    [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.bpe import (  # noqa: E402
    bpe_train, bpe_train_local, word_frequencies)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--deep-merges", type=int, default=1000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("bpe-scale")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    stride = 10_000_000
    res = {"experiment": "bpe_scale", "sf": args.sf, "merges": args.merges}
    merges_by_copies = {}
    for copies in (1, args.copies):
        big = docs
        for i in range(1, copies):
            big = big.unionByName(
                docs.select((F.col("doc_id") + i * stride).alias("doc_id"),
                            "text"))
        big = big.cache()
        big.count()
        vocab = word_frequencies(big).count()
        t0 = time.perf_counter()
        merges = bpe_train(big, n_merges=args.merges)
        sec = round(time.perf_counter() - t0, 2)
        merges_by_copies[copies] = merges
        res[f"x{copies}"] = {"vocab": vocab, "sec": sec,
                             "sec_per_round": round(sec / max(1, len(merges)),
                                                    2)}
        big.unpersist()
    m1 = [(l, r) for l, r, _ in merges_by_copies[1]]
    mN = [(l, r) for l, r, _ in merges_by_copies[args.copies]]
    res["same_merges"] = m1 == mN
    res["counts_scale"] = all(
        cN == c1 * args.copies
        for (_, _, c1), (_, _, cN) in zip(merges_by_copies[1],
                                          merges_by_copies[args.copies])
    )
    assert res["same_merges"], "merge sequence changed with duplication"
    assert res["counts_scale"], "pair counts did not scale linearly"

    # A/B: driver-local trainer vs the distributed twin at the shallow
    # depth (identical merges required), then the local path at realistic
    # depth — the distributed twin would take ~2 s/round there
    t0 = time.perf_counter()
    local_shallow = bpe_train_local(docs, n_merges=args.merges)
    local_shallow_sec = round(time.perf_counter() - t0, 2)
    res["local_matches_distributed"] = (
        local_shallow == merges_by_copies[1])
    assert res["local_matches_distributed"], \
        "local trainer diverged from distributed twin"
    t0 = time.perf_counter()
    deep = bpe_train_local(docs, n_merges=args.deep_merges)
    deep_sec = round(time.perf_counter() - t0, 2)
    res["local"] = {
        "shallow_sec": local_shallow_sec,
        "deep_merges_requested": args.deep_merges,
        "deep_merges_trained": len(deep),
        "deep_sec": deep_sec,
        "deep_ms_per_merge": round(1000 * deep_sec / max(1, len(deep)), 2),
    }

    # the synthetic corpus has a ~31-word template vocabulary, which
    # exhausts after ~90 merges — demonstrate realistic-depth training on
    # a generated large-vocab corpus (Zipf draws over 40k distinct words)
    import random

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab_words = list({
        "".join(rng.choices(alphabet, k=rng.randint(3, 12)))
        for _ in range(40_000)
    })
    zipf_docs = []
    for d in range(400):
        n = rng.randint(200, 400)
        ws = [vocab_words[min(int(rng.paretovariate(1.1)),
                              len(vocab_words) - 1)] for _ in range(n)]
        zipf_docs.append((d, " ".join(ws)))
    sdf = spark.createDataFrame(zipf_docs, "doc_id long, text string")
    t0 = time.perf_counter()
    big_merges = bpe_train_local(sdf, n_merges=args.deep_merges,
                                 min_pair_count=2)
    big_sec = round(time.perf_counter() - t0, 2)
    res["local_large_vocab"] = {
        "distinct_words": len(vocab_words),
        "merges_trained": len(big_merges),
        "sec": big_sec,
        "ms_per_merge": round(1000 * big_sec / max(1, len(big_merges)), 3),
    }

    # APPLIER at realistic depth (round 7): the rank-priority mapInPandas
    # encoder consumes the full deep merge list in one plan node — the
    # fold twin would build one nested F.aggregate per merge (a
    # 1000+-deep expression tree Catalyst cannot analyze in reasonable
    # time), so only the ranked path runs here.  Correctness is asserted
    # against sequential application of the full list on a word sample.
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        bpe_segment, segment_words_ranked)

    t0 = time.perf_counter()
    seg_rows = bpe_segment(sdf, big_merges, apply_method="ranked").collect()
    apply_sec = round(time.perf_counter() - t0, 2)
    assert len(seg_rows) == len(zipf_docs)
    vocab_df = word_frequencies(sdf).select("word").distinct()
    sample = {r["word"]: tuple(r["symbols"])
              for r in segment_words_ranked(vocab_df, big_merges)
              .limit(500).collect()}

    def _seq_apply(word: str) -> tuple[str, ...]:
        sym = list(word)
        for left, right, _ in big_merges:
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return tuple(sym)

    mismatches = sum(1 for w, got in sample.items() if got != _seq_apply(w))
    assert mismatches == 0, f"{mismatches} ranked-vs-sequential mismatches"
    res["ranked_applier_deep"] = {
        "merges_applied": len(big_merges),
        "corpus_docs": len(zipf_docs),
        "apply_sec": apply_sec,
        "sampled_words_verified": len(sample),
        "mismatches": mismatches,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
