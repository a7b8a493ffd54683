"""ONE rendering of the untrusted-decode pixel-budget policy (round 12
review fix: the policy previously existed as twin constant pairs in
vp8l.py and multimodal.py, and the GIF image-descriptor dims bypassed
it entirely).

Header-declared pixel counts are attacker-controlled in every
container, and the vendored pure-Python decoders allocate or loop on
them BEFORE touching pixel data — so every decode gate ties declared
pixels to payload size (``DECODE_PIXELS_PER_BYTE``, set at VP8L's LZ77
maximum copy length — one maximal copy per payload byte is beyond any
real stream) under an absolute cap ``DECODE_MAX_PIXELS`` with a small
floor so legitimate tiny files always clear it.  Legitimately large
photos (> ~4M px) need an explicit caller ``max_pixels``; for a
pure-Python decode path that is the honest cost statement.
"""

from __future__ import annotations

DECODE_MAX_PIXELS = 1 << 22
DECODE_PIXELS_PER_BYTE = 4096
PIXEL_FLOOR = 4096
# Audio gets its own absolute cap (round-12 review fix: the image cap
# of 2^22 rejected any legit FLAC past ~47 s of stereo CD audio).
# 2^25 samples ~ 6.3 min of 44.1 kHz stereo; a FLAC sample is one list
# append + Rice read — far cheaper than a VP8L pixel's four tree walks
# — so the worst-case CPU an adversarial payload can buy stays
# comparable.  Legit longer audio passes an explicit max_samples.
AUDIO_MAX_SAMPLES = 1 << 25


def sample_budget(payload_len: int, max_samples: int | None = None) -> int:
    """The audio-sample twin of :func:`pixel_budget`."""
    if max_samples is not None:
        return int(max_samples)
    return min(AUDIO_MAX_SAMPLES,
               max(PIXEL_FLOOR, DECODE_PIXELS_PER_BYTE * int(payload_len)))


def pixel_budget(payload_len: int, max_pixels: int | None = None) -> int:
    """The pixel budget for a payload of ``payload_len`` bytes; an
    explicit caller ``max_pixels`` overrides the payload-tied policy."""
    if max_pixels is not None:
        return int(max_pixels)
    return min(DECODE_MAX_PIXELS,
               max(PIXEL_FLOOR, DECODE_PIXELS_PER_BYTE * int(payload_len)))


def check_pixels(what: str, w: int, h: int, payload_len: int,
                 max_pixels: int | None = None) -> None:
    """Raise the typed decompression-bomb error when ``w*h`` exceeds
    the budget — call BEFORE any allocation or per-pixel loop."""
    budget = pixel_budget(payload_len, max_pixels)
    if w * h > budget:
        raise ValueError(
            f"{what} declares {w}x{h} = {w * h} pixels against a "
            f"{budget}-pixel budget for a {payload_len}-byte payload "
            "— rejected as a decompression bomb")


# Generic decompression output budget (gzip/deflate streams with no
# trusted declared size — a gzip trailer's ISIZE is attacker bytes).
# DEFLATE's maximum expansion is ~1032:1 (a stored-in-window run per
# compressed byte), so a legitimate stream cannot exceed it; the
# absolute cap bounds what one hostile archive can cost an executor.
DECOMPRESS_MAX_BYTES = 1 << 26          # 64 MiB
DECOMPRESS_BYTES_PER_BYTE = 1032
BYTE_FLOOR = 1 << 16


def byte_budget(payload_len: int, max_bytes: int | None = None) -> int:
    """Output-byte budget for decompressing ``payload_len`` compressed
    bytes; an explicit caller ``max_bytes`` overrides the policy."""
    if max_bytes is not None:
        return int(max_bytes)
    return min(DECOMPRESS_MAX_BYTES,
               max(BYTE_FLOOR, DECOMPRESS_BYTES_PER_BYTE * int(payload_len)))
