"""Vendored dependency-free BMP codec — numpy only.

Decoder covers the common Windows DIB surface: BITMAPINFOHEADER (or
larger V4/V5 headers), uncompressed (BI_RGB) 24- and 32-bit pixels,
bottom-up or top-down row order, 4-byte row padding.  Paletted /
RLE-compressed / 16-bit variants raise ``ValueError`` — the same
unsupported-variant contract as the other vendored decoders.

The encoder writes bottom-up 24-bit BI_RGB for fixtures; lossless, so
round-trips are asserted bit-exact in tests.

Reference parity note: the reference system has no media path; this
module belongs to the training-data multimodal extension surface.
"""

from __future__ import annotations

import numpy as np


def decode_bmp(content: bytes) -> np.ndarray:
    """BMP decode -> (height, width, 3) uint8 RGB."""
    buf = bytes(content)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP ({bpp}-bit, compression {compression}); "
            "24/32-bit uncompressed only")
    if compression == 3:
        # BI_BITFIELDS: only the standard 32-bit BGRA channel layout is
        # supported — verify the RGB masks (at byte 54 whether they trail a
        # 40-byte BITMAPINFOHEADER or sit inside a V4/V5 header) instead of
        # silently decoding a non-BGRA mask set with swapped channels
        if bpp != 32:
            raise ValueError("BMP BI_BITFIELDS requires 32-bit pixels")
        masks = tuple(
            int.from_bytes(buf[54 + 4 * i:58 + 4 * i], "little")
            for i in range(3)
        )
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                f"unsupported BMP bitfields masks {[hex(m) for m in masks]}; "
                "standard BGRA layout only")
    if w <= 0:
        raise ValueError(f"invalid BMP width {w}")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raster = np.frombuffer(buf, np.uint8, stride * h, data_off)
    rows = raster.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up 24-bit BI_RGB BMP (lossless)."""
    px = np.asarray(pixels, np.uint8)
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), np.uint8)
    raster[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = raster.tobytes()
    out = bytearray(b"BM")
    out += (54 + len(data)).to_bytes(4, "little")
    out += b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
    out += (40).to_bytes(4, "little")
    out += w.to_bytes(4, "little") + h.to_bytes(4, "little")
    out += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    out += (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
    out += (2835).to_bytes(4, "little") * 2     # 72 DPI
    out += (0).to_bytes(4, "little") * 2
    out += data
    return bytes(out)
