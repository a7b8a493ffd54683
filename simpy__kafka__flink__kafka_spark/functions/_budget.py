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
