"""Vendored dependency-free baseline TIFF codec — stdlib + numpy.

Decoder covers baseline TIFF 6.0 stills: both byte orders (II/MM),
8-bit grayscale (either photometric polarity) and chunky RGB/RGBA,
multi-strip layout, uncompressed or PackBits (32773) compression.
Tiled, planar, palette, LZW/JPEG-compressed, and non-8-bit variants
raise ``ValueError`` — the same honest unsupported-variant contract as
the other vendored decoders.

The encoder writes single-strip chunky little-endian RGB (optionally
PackBits-compressed) for fixtures; lossless, so round-trips are
asserted bit-exact in tests.

Reference parity note: the reference system has no media path; this
module belongs to the training-data multimodal extension surface.
"""

from __future__ import annotations

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                        # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                      # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    if len(out) < expected:
        raise ValueError("truncated TIFF PackBits stream")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until the next >=3 run (2-runs inside literals
        # are cheaper left literal)
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first code packing, codes
    256/257 as Clear/EOI, and the spec's EARLY-CHANGE rule (code width
    bumps one code sooner than GIF's LZW)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    bitpos = 0
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    total_bits = len(data) * 8
    while len(out) < expected:
        if bitpos + width > total_bits:
            raise ValueError("truncated TIFF LZW stream")
        code = 0
        for _ in range(width):
            code = (code << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7)))
                                  & 1)
            bitpos += 1
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):           # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        # early change: the encoder bumps when ITS next_code (one ahead of
        # this table, which lags by the in-flight code) hits 2^width - 1 —
        # so the decoder bumps at 2^width - 2 (libtiff's MAXCODE(n)-1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF LZW stream shorter than raster")
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Greedy TIFF-variant LZW compressor (fixture generator; mirrors the
    early-change width rule)."""
    CLEAR, EOI = 256, 257
    bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}
    width = 9

    def reset() -> None:
        nonlocal table, width
        table = {bytes([i]): i for i in range(256)}
        width = 9

    reset()
    bits.append((CLEAR, width))
    next_code = 258
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:    # early change
            width += 1
        if next_code >= 4094:
            bits.append((CLEAR, width))
            reset()
            next_code = 258
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((EOI, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(content: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Baseline TIFF decode -> (height, width, 3) uint8 (first IFD).
    Truncated IFD walks index past the buffer; those fold into the
    typed ValueError family (no untyped crash leaves the Arrow task),
    and the declared extent is budget-gated before any strip decodes."""
    try:
        return _decode_tiff(bytes(content), max_pixels)
    except (IndexError, KeyError) as exc:
        # mutated IFDs reference missing required tags (e.g. strip
        # offsets) — malformed input, not decoder state
        raise ValueError("truncated or malformed TIFF stream") from exc


def tiff_byte_order(buf: bytes) -> str:
    """'little'/'big' from a TIFF header (II*\\0 / MM\\0*), typed error
    otherwise — shared by the pixel decoder and the EXIF walk."""
    if buf[:2] == b"II":
        bo = "little"
    elif buf[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF")
    if int.from_bytes(buf[2:4], bo) != 42:
        raise ValueError("not a TIFF (bad magic number)")
    return bo


def walk_ifd(buf: bytes, bo: str,
             ifd: int) -> dict[int, tuple[int, int, bytes]]:
    """ONE IFD's entries as tag -> (type, count, raw value bytes) —
    the single IFD-walk rendering, shared by the TIFF pixel decoder
    and the JPEG/EXIF metadata walk (functions/jpeg.py).  Offsets and
    sizes are bounds-checked; out-of-buffer value pointers raise the
    typed family."""
    if ifd < 0 or ifd + 2 > len(buf):
        raise ValueError("TIFF IFD offset outside buffer")
    n_entries = int.from_bytes(buf[ifd:ifd + 2], bo)
    if ifd + 2 + 12 * n_entries > len(buf):
        raise ValueError("truncated TIFF IFD")
    tags: dict[int, tuple[int, int, bytes]] = {}
    for e in range(n_entries):
        off = ifd + 2 + 12 * e
        tag = int.from_bytes(buf[off:off + 2], bo)
        typ = int.from_bytes(buf[off + 2:off + 4], bo)
        cnt = int.from_bytes(buf[off + 4:off + 8], bo)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = buf[off + 8:off + 8 + size]
        else:
            ptr = int.from_bytes(buf[off + 8:off + 12], bo)
            if ptr + size > len(buf):
                raise ValueError(
                    f"TIFF tag {tag} value runs outside buffer")
            raw = buf[ptr:ptr + size]
        tags[tag] = (typ, cnt, raw)
    return tags


def ifd_ints(typ: int, raw: bytes, bo: str) -> list[int]:
    """Integer view of one IFD value (RATIONAL keeps the numerator) —
    the decoder's historical conversion, factored."""
    step = _TYPE_SIZES.get(typ, 1)
    if typ == 5:                           # RATIONAL: keep numerator
        return [int.from_bytes(raw[i:i + 4], bo)
                for i in range(0, len(raw), 8)]
    return [int.from_bytes(raw[i:i + step], bo)
            for i in range(0, len(raw), step)]


def _decode_tiff(buf: bytes, max_pixels: int | None) -> np.ndarray:
    bo = tiff_byte_order(buf)
    ifd = int.from_bytes(buf[4:8], bo)
    tags = {tag: ifd_ints(typ, raw, bo)
            for tag, (typ, cnt, raw) in walk_ifd(buf, bo, ifd).items()}

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(256), one(257)
    # bomb guard (round-12 sweep): PackBits/LZW strips expand toward
    # rows*w*spp — header-controlled, so a huge declared extent must
    # fail the shared budget BEFORE any strip decodes
    from ._budget import check_pixels

    check_pixels("TIFF", w, h, len(buf), max_pixels)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8-bit only)")
    if one(284, 1) != 1:
        raise ValueError("unsupported TIFF planar configuration")
    if 322 in tags or 323 in tags:
        raise ValueError("unsupported tiled TIFF")
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if compression not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} "
            "(uncompressed, LZW, and PackBits only)")
    if compression == 5 and 317 in tags and tags[317][0] != 1:
        raise ValueError("unsupported TIFF LZW predictor")
    offsets = tags[273]
    counts = tags.get(279, [len(buf) - offsets[0]])
    rows_per_strip = one(278, h)
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = buf[so:so + sc]
        rows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == 32773:
            strip = _packbits_decode(strip, rows * w * spp)
        elif compression == 5:
            strip = _lzw_decode_tiff(strip, rows * w * spp)
        raw += strip
    if len(raw) < h * w * spp:
        raise ValueError("TIFF strip data shorter than image")
    px = np.frombuffer(bytes(raw), np.uint8,
                       h * w * spp).reshape(h, w, spp)
    if photometric == 0:                   # WhiteIsZero
        px = 255 - px
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])   # drop alpha if present


def encode_tiff(pixels: np.ndarray, packbits: bool = False,
                lzw: bool = False) -> bytes:
    """(h, w, 3) uint8 -> single-strip chunky little-endian RGB TIFF
    (lossless; fixture generator).  ``packbits`` or ``lzw`` selects the
    compression (mutually exclusive)."""
    if packbits and lzw:
        raise ValueError("choose at most one of packbits/lzw")
    px = np.asarray(pixels, np.uint8)
    h, w = px.shape[:2]
    data = px.tobytes()
    if packbits:
        data = _packbits_encode(data)
    elif lzw:
        data = _lzw_encode_tiff(data)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        (258, 3, 3, None),                 # BitsPerSample -> offset
        (259, 3, 1, 32773 if packbits else (5 if lzw else 1)),
        (262, 3, 1, 2),                    # RGB
        (273, 4, 1, None),                 # StripOffsets -> after IFD
        (277, 3, 1, 3),
        (278, 3, 1, h),
        (279, 4, 1, len(data)),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    bps_off = ifd_off + ifd_len
    data_off = bps_off + 6
    out = bytearray(b"II" + (42).to_bytes(2, "little")
                    + ifd_off.to_bytes(4, "little"))
    out += len(entries).to_bytes(2, "little")
    for tag, typ, cnt, val in entries:
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        out += cnt.to_bytes(4, "little")
        if tag == 258:
            out += bps_off.to_bytes(4, "little")
        elif tag == 273:
            out += data_off.to_bytes(4, "little")
        elif typ == 3:
            out += val.to_bytes(2, "little") + b"\x00\x00"
        else:
            out += val.to_bytes(4, "little")
    out += (0).to_bytes(4, "little")       # no next IFD
    out += (8).to_bytes(2, "little") * 3   # BitsPerSample 8,8,8
    out += data
    return bytes(out)
