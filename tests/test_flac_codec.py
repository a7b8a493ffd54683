"""Vendored FLAC codec: bit-exact lossless round-trips across every
subframe strategy and stereo mode, Rice/LPC/fixed predictor paths,
multi-byte frame numbering, CRC verification, dispatch through
decode_audio, the executed Arrow path, and corrupt-stream errors."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.flac import (
    crc8, crc16, decode_flac, encode_flac)
from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    audio_stats, decode_audio)


def _sine(n: int, period: float = 20.0, amp: float = 12000.0) -> np.ndarray:
    return (np.sin(np.arange(n) / period) * amp).astype(np.int32)


@pytest.mark.parametrize("sub", ["verbatim", "fixed", "lpc", "auto"])
def test_mono_roundtrip_bit_exact(sub):
    mono = _sine(5000)
    out, rate = decode_flac(encode_flac(mono, 8000, subframe=sub,
                                        block_size=1024))
    assert rate == 8000
    assert np.array_equal(out[:, 0], mono)


def test_fixed_predictor_actually_compresses_smooth_signal():
    mono = _sine(5000)
    verb = encode_flac(mono, 8000, subframe="verbatim", block_size=1024)
    fixed = encode_flac(mono, 8000, subframe="fixed", block_size=1024)
    assert len(fixed) < len(verb) // 2


@pytest.mark.parametrize("stereo", ["independent", "mid_side"])
def test_stereo_roundtrip_bit_exact(stereo):
    t = np.arange(3000)
    st = np.stack([(np.sin(t / 15.0) * 9000).astype(np.int32),
                   (np.sin(t / 17.0) * 8000 + 101).astype(np.int32)], 1)
    out, rate = decode_flac(
        encode_flac(st, 44100, subframe="fixed", stereo=stereo,
                    block_size=512))
    assert rate == 44100
    assert np.array_equal(out, st)


def test_constant_subframe_for_flat_signal():
    flat = np.full(3000, -137, np.int32)
    raw = encode_flac(flat, 16000, subframe="auto", block_size=1024)
    assert len(raw) < 120          # 3 constant frames + headers
    out, _ = decode_flac(raw)
    assert np.array_equal(out[:, 0], flat)


def test_noise_roundtrip_and_partial_final_block():
    rng = np.random.default_rng(11)
    noise = rng.integers(-32768, 32768, 4097).astype(np.int32)  # 4096 + 1
    for sub in ("verbatim", "fixed"):
        out, _ = decode_flac(encode_flac(noise, 48000, subframe=sub))
        assert np.array_equal(out[:, 0], noise)


def test_many_frames_exercise_multibyte_frame_numbers():
    long = _sine(200 * 256, period=9.0, amp=5000.0)
    out, _ = decode_flac(encode_flac(long, 8000, block_size=256,
                                     subframe="fixed"))
    assert np.array_equal(out[:, 0], long)


def test_corrupt_frame_fails_crc():
    raw = bytearray(encode_flac(_sine(1000), 8000, subframe="fixed",
                                block_size=1024))
    raw[-10] ^= 0x40               # flip a bit inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(raw))


def test_non_flac_raises_value_error():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"definitely not flac")


def test_crc_implementations_match_known_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 over "123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_decode_audio_dispatches_flac():
    mono = _sine(2000)
    samples, rate = decode_audio(encode_flac(mono, 22050, subframe="fixed"))
    assert rate == 22050
    assert np.array_equal(samples[:, 0], mono)


def test_audio_stats_arrow_path_over_flac(spark):
    mono = _sine(2000)
    st = np.stack([mono, -mono], 1)
    rows = [(1, bytearray(encode_flac(mono, 8000, subframe="fixed"))),
            (2, bytearray(encode_flac(st, 16000, subframe="fixed",
                                      stereo="mid_side")))]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in audio_stats(media).collect()}
    assert (got[1]["n_frames"], got[1]["sample_rate"],
            got[1]["n_channels"]) == (2000, 8000, 1)
    assert (got[2]["n_frames"], got[2]["sample_rate"],
            got[2]["n_channels"]) == (2000, 16000, 2)
    exp = round(float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))), 6)
    assert got[1]["rms"] == exp


def test_lpc_tail_block_shorter_than_order_roundtrips():
    # 4097 samples at block 1024: the final 1-sample block cannot run an
    # order-2 predictor and must fall back to verbatim WITHOUT writing a
    # second subframe padding bit (regression: corrupted stream)
    mono = _sine(4097)
    out, _ = decode_flac(encode_flac(mono, 8000, subframe="lpc",
                                     block_size=1024))
    assert np.array_equal(out[:, 0], mono)
    st = np.stack([mono, -mono], 1)
    out2, _ = decode_flac(encode_flac(st, 8000, subframe="lpc",
                                      stereo="mid_side", block_size=1024))
    assert np.array_equal(out2, st)


def test_empty_stream_roundtrips():
    out, rate = decode_flac(encode_flac(np.zeros((0, 2), np.int32), 44100))
    assert rate == 44100
    assert out.shape == (0, 2)


def test_id3v2_prefixed_flac_decodes():
    # files tagged by common tools carry an ID3v2 header before fLaC;
    # the decoder skips it (syncsafe size) and decode_audio dispatches
    mono = _sine(1500)
    raw = encode_flac(mono, 8000, subframe="fixed")
    tag_body = b"\x00" * 200
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + tag_body
    tagged = id3 + raw
    out, rate = decode_flac(tagged)
    assert rate == 8000 and np.array_equal(out[:, 0], mono)
    samples, rate2 = decode_audio(tagged)
    assert rate2 == 8000 and np.array_equal(samples[:, 0], mono)


def test_large_id3_tag_still_dispatches():
    # a tag bigger than any fixed-probe window: dispatch must parse the
    # syncsafe size rather than search a prefix
    mono = _sine(800)
    raw = encode_flac(mono, 8000, subframe="fixed")
    size = 60000
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    tagged = b"ID3\x04\x00\x00" + ss + b"\x00" * size + raw
    samples, rate = decode_audio(tagged)
    assert rate == 8000 and np.array_equal(samples[:, 0], mono)


def test_resample_audio_reencodes_in_kind():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_audio, encode_wav, resample_audio)
    # a pure linear ramp survives linear interpolation exactly
    ramp = np.linspace(-8000, 8000, 4000).astype(np.int16)[:, None]
    wav = encode_wav(ramp, 16000)
    down = resample_audio(wav, 8000)
    assert down[:4] == b"RIFF"
    s, rate = decode_audio(down)
    assert rate == 8000 and s.shape[0] == 2000
    expect = np.rint(np.linspace(-8000, 8000, 2000)).astype(np.int16)
    assert np.abs(s[:, 0].astype(int) - expect.astype(int)).max() <= 1
    # FLAC in -> FLAC out, stereo preserved
    st = np.stack([ramp[:, 0], -ramp[:, 0]], 1).astype(np.int32)
    up = resample_audio(encode_flac(st, 8000, subframe="fixed"), 16000)
    assert up[:4] == b"fLaC"
    s2, rate2 = decode_audio(up)
    assert rate2 == 16000 and s2.shape == (8000, 2)
    assert np.array_equal(s2[0], st[0]) and np.array_equal(s2[-1], st[-1])
