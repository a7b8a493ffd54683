"""Vendored dependency-free GIF codec (GIF87a/89a) — stdlib + numpy.

Decoder covers the still-image surface: global/local color tables, LZW
decompression (variable code width up to 12 bits, CLEAR/END handling,
the KwKwK self-reference case), interlaced row order, and extension
blocks (skipped; for animated GIFs the FIRST frame is returned, without
graphic-control compositing — documented).  Transparency is flattened
(the transparent index renders as its palette color).

The encoder exists for fixtures: palette-building from unique colors
(<= 256 required), a real greedy-string-table LZW compressor (so the
decoder's dictionary-growth and KwKwK paths get exercised, unlike a
clear-code-spam encoder), optional interlacing.  Lossless for
palette-sized images, so round-trips are asserted BIT-EXACT in tests.

Reference parity note: no media path exists in the reference; this
module belongs to the training-data multimodal extension surface.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


class _LSBReader:
    """LSB-first bit reader (GIF packs LZW codes little-endian)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data) * 8:
                raise ValueError("truncated GIF LZW stream")
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


def _lzw_decode(min_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_size
    end = clear + 1
    reader = _LSBReader(data)
    out = bytearray()

    def reset() -> tuple[dict[int, bytes], int, int]:
        return ({i: bytes([i]) for i in range(clear)}, end + 1, min_size + 1)

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt GIF LZW code")
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:            # KwKwK
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _lzw_encode(min_size: int, indices: bytes) -> bytes:
    """Greedy string-table LZW compressor (the real thing, so decoders
    exercise dictionary growth); resets via CLEAR at the 12-bit cap."""
    clear = 1 << min_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []   # (code, width)

    def reset() -> tuple[dict[bytes, int], int, int]:
        return ({bytes([i]): i for i in range(clear)}, end + 1, min_size + 1)

    table, next_code, width = reset()
    out_bits.append((clear, width))
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        out_bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # decoder bumps width when ITS next_code (== ours, it lags by the
        # in-flight code) hits 2^width; emitting at old width once more
        # desyncs — bump as soon as the entry that fills the width exists
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        w = c
    if w:
        out_bits.append((table[w], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, wd in out_bits:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def decode_gif(content: bytes,
               max_pixels: int | None = None) -> np.ndarray:
    """GIF decode -> (height, width, 3) uint8 (first frame).

    Truncated headers / extension chains index past the buffer in the
    block walk; those fold into the typed ValueError family here (an
    adversarial stream must never leak an untyped crash out of the
    Arrow task).

    Bomb guard (round-12 review fix): BOTH the logical-screen dims and
    each image DESCRIPTOR's dims are budget-checked against the shared
    policy (functions/_budget.py) before any allocation or the LZW
    loop — the descriptor dims drive `_lzw_decode`'s expansion target
    and the index/frame allocations, and they are independent of the
    screen dims the outer `decode_image` gate sees, so an ungated
    descriptor was a budget bypass."""
    from ._budget import check_pixels

    try:
        return _decode_gif(bytes(content), max_pixels, check_pixels)
    except IndexError as exc:
        raise ValueError("truncated or malformed GIF stream") from exc


def _decode_gif(buf: bytes, max_pixels, check_pixels) -> np.ndarray:
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(buf[6:8], "little")
    sh = int.from_bytes(buf[8:10], "little")
    check_pixels("GIF logical screen", sw, sh, len(buf), max_pixels)
    packed = buf[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension: label + sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left = int.from_bytes(buf[pos + 1:pos + 3], "little")
        top = int.from_bytes(buf[pos + 3:pos + 5], "little")
        w = int.from_bytes(buf[pos + 5:pos + 7], "little")
        h = int.from_bytes(buf[pos + 7:pos + 9], "little")
        check_pixels("GIF image descriptor", w, h, len(buf), max_pixels)
        ipacked = buf[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:                 # local color table
            n = 2 << (ipacked & 7)
            table = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image without a color table")
        min_size = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            data += buf[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(min_size, bytes(data), w * h), np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:                 # interlaced
            de = np.empty_like(idx)
            de[_interlace_rows(h)] = idx
            idx = de
        if idx.max() >= len(table):
            raise ValueError("GIF index outside color table")
        frame = table[idx]                 # (h, w, 3)
        # first frame only: place into the logical screen and return
        screen = np.zeros((sh, sw, 3), np.uint8)
        screen[top:top + h, left:left + w] = frame
        return screen
    raise ValueError("GIF contains no image data")


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array with <= 256 unique colors as a
    GIF89a (lossless for palette-sized inputs; fixture generator)."""
    px = np.asarray(pixels, np.uint8)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} unique colors; GIF needs <= 256")
    depth = max(1, int(len(colors) - 1).bit_length())   # table size 2^depth
    n = 1 << depth
    palette = np.zeros((n, 3), np.uint8)
    palette[:len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_rows(h)]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])            # GCT flag + size
    out += palette.tobytes()
    out += b"\x2c" + b"\x00" * 4                        # image at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    min_size = max(2, depth)                            # LZW min code size
    out.append(min_size)
    data = _lzw_encode(min_size, idx.tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
