"""The two formally DECIDED media seams (round 15, VERDICT r14 task 3
— the VP8-§13.5 closure posture applied to MP3 PCM and MP4 frame
decode): each seam is a TYPED refusal fired only after the container
walk succeeds (the detector), never a blanket catch, plus an executed
datasheet audit counting the affected files.
"""
from __future__ import annotations

import pytest


def test_mp3_pcm_refusal_is_typed_and_informed():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        _mp3_synth_bytes, decode_audio)
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        mp3_stream_stats)

    buf = _mp3_synth_bytes(7)            # well-formed CBR train
    with pytest.raises(NotImplementedError) as ei:
        decode_audio(buf)
    msg = str(ei.value)
    assert msg.startswith("mp3-layer3-pcm")
    # informed: the refusal carries the walk's own stats
    s = mp3_stream_stats(buf)
    assert f"{s.n_frames} Layer III frames" in msg
    assert f"{s.duration_ms} ms" in msg

    # the ID3-prefixed and truncated variants refuse the same way
    for i in (4, 5):                     # i%2==0 -> ID3; i%4==1 -> cut
        with pytest.raises(NotImplementedError, match="mp3-layer3-pcm"):
            decode_audio(_mp3_synth_bytes(i))


def test_mp3_lookalike_junk_keeps_generic_seam():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_audio)

    # sync-looking first bytes but no walkable frame: the DETECTOR
    # (mp3_stream_stats) fails, so the typed posture code must NOT
    # fire — the generic library-seam message does
    junk = b"\xff\xe0" + b"\x00" * 8
    with pytest.raises(NotImplementedError) as ei:
        decode_audio(junk)
    assert not str(ei.value).startswith("mp3-layer3-pcm")


def test_mp4_frame_refusal_is_typed_and_informed():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        build_mp4, decode_video_frames, mp4_stats)

    specs = {"vide": {"timescale": 30_000, "stts": [(24, 1001)],
                      "sizes": 500, "n_chunks": 2}}
    buf = build_mp4(5_000, tracks=(("vide", "avc1"),),
                    sample_specs=specs)
    with pytest.raises(NotImplementedError) as ei:
        decode_video_frames(buf)
    msg = str(ei.value)
    assert msg.startswith("mp4-frame-decode")
    st = mp4_stats(buf)
    assert st["video_codec"] in msg      # informed: codec named
    assert str(st["video_n_samples"]) in msg

    # audio-only: typed ValueError (nothing to decode), not the seam
    audio = build_mp4(5_000, tracks=(("soun", "mp4a"),))
    with pytest.raises(ValueError, match="no video track"):
        decode_video_frames(audio)

    # junk keeps the box walk's typed family
    with pytest.raises(ValueError):
        decode_video_frames(b"\x00\x00\x00\x08free" + b"x" * 8)


def test_seam_audits_count_executed_refusals(spark):
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        mp3_pcm_seam_audit, mp3_synth_stats, mp4_frame_seam_audit)

    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    audit = mp3_pcm_seam_audit(docs)
    rows = {r.doc_id: r for r in audit.collect()}
    assert len(rows) == 24
    # every fixture MP3 is well-formed -> every refusal fires
    assert all(r.refused == 1 for r in rows.values())
    # durations agree with the stats walk (the one fixture rendering)
    stats = {r.doc_id: r.duration_ms
             for r in mp3_synth_stats(docs).collect()}
    assert all(rows[i].duration_ms == stats[i] for i in rows)

    # mp4: refusals = exactly the files with a video track
    import pandas as pd

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        build_mp4)

    def mk(i: int) -> bytes:
        tracks = ((("vide", "avc1"), ("soun", "mp4a")),
                  (("vide", "hvc1"),),
                  (("soun", "Opus"),))[i % 3]
        specs = {"vide": {"timescale": 30_000, "stts": [(8, 1001)],
                          "sizes": 100, "n_chunks": 1},
                 "soun": {"timescale": 48_000, "stts": [(8, 1024)],
                          "sizes": 64, "n_chunks": 1}}
        return build_mp4(2_000, tracks=tracks, sample_specs=specs)

    pdf = pd.DataFrame({"doc_id": range(12),
                        "content": [mk(i) for i in range(12)]})
    mdf = spark.createDataFrame(pdf)
    got = {r.doc_id: r.refused
           for r in mp4_frame_seam_audit(mdf).collect()}
    assert got == {i: (1 if i % 3 in (0, 1) else 0) for i in range(12)}
