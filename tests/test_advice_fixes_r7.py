"""Regression tests for the round-6 ADVICE findings fixed in round 7:

1. text.py `_anchor_candidates` silently long-cast non-numeric doc ids —
   now rejected with a typed error (methods full/window stay id-agnostic).
2. similarity.py `pq_encode` / `pq_topk` Arrow iterators raised IndexError
   on empty pandas batches (shape-(0,) codes array) — now skipped.
3. multimodal.py `resample_audio` read FLAC STREAMINFO bytes out of ANY
   non-RIFF container — now gated on an actual fLaC magic (ID3-aware);
   24-bit WAV raises a typed ValueError instead of a raw KeyError.
4. plans/dataprep.py cache() accumulation across a sequential registry
   drive — `__spark_entry__.queries()` now clears the previous query's
   caches at each build.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_anchor_method_rejects_non_integral_ids(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)

    docs = spark.createDataFrame(
        [("doc-a", "x " * 40), ("doc-b", "x " * 40)],
        "doc_id string, text string")
    with pytest.raises(ValueError, match="integral"):
        exact_substring_spans(docs, min_len=30, method="anchor").collect()
    # the window method accepts string ids fine
    out = exact_substring_spans(docs, min_len=30, method="window").collect()
    assert {r["doc_id"] for r in out} == {"doc-a", "doc-b"}


def test_pq_paths_tolerate_empty_partitions(spark):
    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        pq_encode, pq_topk, pq_train)

    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(16)])
            for i in range(12)]
    # far more partitions than rows -> several empty Arrow batches
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(32)
    cb = pq_train(emb, m=4, k=4, sample=12, iters=3)
    enc = pq_encode(emb, cb).collect()
    assert len(enc) == 12
    assert all(len(r["codes"]) == 4 for r in enc)
    topk = pq_topk(emb, n_queries=2, k=3, m=4, n_centroids=4).collect()
    assert {r["query_id"] for r in topk} == {0, 1}


def _wav_bytes(sampwidth: int, frames: bytes, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(sampwidth)
        wv.setframerate(rate)
        wv.writeframes(frames)
    return buf.getvalue()


def test_24bit_wav_raises_typed_error():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_audio)

    content = _wav_bytes(3, b"\x00\x01\x02" * 16)
    with pytest.raises(ValueError, match="24-bit"):
        decode_audio(content)


def test_flac_bits_reader_rejects_non_flac():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        _flac_bits_per_sample, _flac_magic_offset)

    junk = b"OggS" + bytes(64)
    assert _flac_magic_offset(junk) is None
    with pytest.raises(ValueError, match="fLaC"):
        _flac_bits_per_sample(junk)


def test_resample_wav_uses_dtype_bits_not_streaminfo():
    # a 16-bit WAV must never go through the FLAC STREAMINFO reader
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_audio, resample_audio)

    sig = (np.sin(np.linspace(0, 20, 400)) * 8000).astype(np.int16)
    content = _wav_bytes(2, sig.tobytes(), rate=8000)
    out = resample_audio(content, 4000)
    samples, rate = decode_audio(out)
    assert rate == 4000
    assert abs(samples.shape[0] - 200) <= 1


def test_entry_queries_clear_previous_caches(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()
    # a cache()-heavy query pins storage...
    qs["near_dup_verified"](spark, sf_dir).count()
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 0
    # ...which the NEXT build through the contract releases
    qs["token_count"](spark, sf_dir).count()
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == 0
