"""Vendored dependency-free baseline JPEG codec (ITU-T T.81 sequential
DCT, Huffman entropy coding) — numpy + stdlib only.

Decoder supports what the overwhelming majority of real-world JPEG files
are: baseline/extended sequential (SOF0/SOF1) Huffman scans, 8-bit
samples, grayscale or YCbCr with arbitrary sampling factors (4:4:4,
4:2:2, 4:2:0, ...), restart markers, multi-table DQT/DHT segments.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``ValueError`` — honest unsupported-variant errors, same contract as the
vendored PNG decoder.

The encoder exists for two product reasons: it is the re-encode side of
``resize_image`` for JPEG payloads, and it generates valid fixtures in
tests without any imaging library.  It emits baseline 4:4:4 or 4:2:0
with a *fixed, simple* canonical Huffman table (every DC category at 5
bits, every AC run/size symbol at 9 bits).  That is deliberately not the
Annex K optimized table: JPEG stores the Huffman tables in the file
(DHT), so any valid prefix code round-trips, and the fixed-width code
keeps the table construction trivially auditable.  Compression ratio is
not a goal of this vendored path; a production deployment swaps
libjpeg-turbo in at the same ``decode_image`` seam.

Entropy decode is a per-bit Python loop — appropriate for the fixture /
test sizes this vendored codec serves; the block math (dequant, IDCT,
color transform) is vectorized numpy.

Reference parity note: the reference system (PyFlink trace linker) has
no media path at all; this module belongs to the training-data-pipeline
extension surface (multimodal columns) required of this engine.
"""

from __future__ import annotations

import numpy as np

# --- shared tables -----------------------------------------------------------

def _zigzag() -> np.ndarray:
    """Natural (row-major) index of each zigzag position, per T.81 fig 5."""
    cells = [(r, c) for r in range(8) for c in range(8)]
    cells.sort(key=lambda rc: (rc[0] + rc[1],
                               -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0]))
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


ZIGZAG = _zigzag()                       # zigzag pos -> natural pos

# Orthonormal 8x8 DCT-II basis: forward F = A @ f @ A.T, inverse f = A.T @ F @ A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) * 0.5
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex-K-shaped luminance/chrominance base quant tables (values are data,
# carried in the file's DQT segment; the decoder never assumes them).
_QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling: 50 -> base table, 100 -> all ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# Fixed encoder-side Huffman code: 12 DC categories at 5 bits (Kraft sum
# 12/32), 255 AC symbols at 9 bits + 1 at 10 (DHT counts are one byte each,
# so a single length cannot hold all 256) — valid canonical prefix codes
# with no all-ones codeword (T.81 requires the all-1s code stay unused).
_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11            # counts per code length 1..16
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_AC_VALS = list(range(256))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical DHT (bits, vals) table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for Huffman decoding."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


# --- bit I/O -----------------------------------------------------------------

class _BitReader:
    """MSB-first reader over an already byte-unstuffed entropy segment."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, lut: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing; final byte padded with 1s."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude field to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- decoder -----------------------------------------------------------------

def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline/extended-sequential JPEG decode -> (height, width, 3) uint8.

    Grayscale images are replicated to 3 channels (same contract as the
    other vendored decoders).  Raises ValueError on progressive,
    arithmetic-coded, or non-8-bit streams.
    """
    buf = bytes(content)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None            # (h, w, [(cid, hi, vi, tq)])
    restart = 0
    scan = None             # ([(comp_idx, td, ta)], ecs bytes)
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = buf[pos + 1]
        if marker == 0xD9:          # EOI with no scan
            break
        seglen = int.from_bytes(buf[pos + 2:pos + 4], "big")
        data = buf[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:          # DQT (may hold several tables)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(data[i:i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(data[i:i + 64], np.uint8).astype(np.int64)
                    i += 64
                qtables[tq] = vals  # zigzag order, as stored
        elif marker in (0xC0, 0xC1):   # SOF0 / SOF1
            if data[0] != 8:
                raise ValueError(f"unsupported JPEG precision {data[0]}")
            h = int.from_bytes(data[1:3], "big")
            w = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c], data[7 + 3 * c], data[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(only baseline/extended sequential Huffman)"
            )
        elif marker == 0xC4:        # DHT (may hold several tables)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(data[i + 17:i + 17 + nvals])
                huff[(tc, th)] = _decode_lut(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:        # DRI
            restart = int.from_bytes(data[0:2], "big")
        elif marker == 0xDA:        # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            sel = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                idx = next(i for i, comp in enumerate(frame[2]) if comp[0] == cs)
                sel.append((idx, tt >> 4, tt & 15))
            # split ECS at restart markers, un-stuffing 0xFF00 as we go
            segments: list[bytes] = []
            cur = bytearray()
            i = pos
            while i < len(buf) - 1:
                if buf[i] == 0xFF:
                    nxt = buf[i + 1]
                    if nxt == 0x00:
                        cur.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:     # RSTn
                        segments.append(bytes(cur))
                        cur = bytearray()
                        i += 2
                        continue
                    break                        # EOI or next marker
                cur.append(buf[i])
                i += 1
            segments.append(bytes(cur))
            scan = (sel, segments)
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    sel, segments = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), np.float64)
        for _, hi, vi, _ in comps
    ]
    quant = [qtables[tq][ZIGZAG].reshape(8, 8).astype(np.float64)
             for _, _, _, tq in comps]

    coefs = np.zeros(64, np.float64)
    mcu = 0
    for seg in segments:
        reader = _BitReader(seg)
        preds = [0] * len(comps)
        n_in_seg = restart if restart else (mcus_x * mcus_y - mcu)
        for _ in range(min(n_in_seg, mcus_x * mcus_y - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for comp_idx, td, ta in sel:
                _, hi, vi, _ = comps[comp_idx]
                dc_lut, ac_lut = huff[(0, td)], huff[(1, ta)]
                for by in range(vi):
                    for bx in range(hi):
                        coefs[:] = 0.0
                        s = reader.decode(dc_lut)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[comp_idx] += diff
                        coefs[0] = preds[comp_idx]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:       # ZRL
                                    k += 16
                                    continue
                                break             # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = coefs.reshape(8, 8) * quant[comp_idx]
                        px = _A.T @ block @ _A + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[comp_idx][y0:y0 + 8, x0:x0 + 8] = px
            mcu += 1

    full = []
    for (cid, hi, vi, _), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder -----------------------------------------------------------------

def _fdct_quant(plane: np.ndarray, qt: np.ndarray, by: int, bx: int) -> np.ndarray:
    block = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
    return np.rint((_A @ block @ _A.T) / qt).astype(np.int64)


def _encode_block(writer: _BitWriter, coefs: np.ndarray, pred: int,
                  dc_codes: dict[int, tuple[int, int]],
                  ac_codes: dict[int, tuple[int, int]]) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "4:4:4", restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as baseline
    JPEG.  ``subsampling`` is ``"4:4:4"`` or ``"4:2:0"`` (ignored for
    grayscale).  ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs."""
    px = np.asarray(pixels, np.float64)
    gray = px.ndim == 2
    if gray:
        planes = [px]
        samp = [(1, 1)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            ph, pw = _pad_to(cb, 2, 2).shape
            cb2 = _pad_to(cb, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            cr2 = _pad_to(cr, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            planes, samp = [y, cb2, cr2], [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad every plane so the MCU grid divides it exactly
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.pad(p,
               ((0, mcus_y * vi * 8 - p.shape[0]),
                (0, mcus_x * hi * 8 - p.shape[1])), mode="edge")
        for p, (hi, vi) in zip(planes, samp)
    ]

    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)
    qts = [qluma] + ([] if gray else [qchroma])
    qt_of = [0] + ([] if gray else [1, 1])
    qt_nat = [qt[ZIGZAG].reshape(8, 8).astype(np.float64) for qt in qts]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")                               # SOI
    for tq, qt in enumerate(qts):                              # DQT
        out += b"\xff\xdb" + (3 + 64).to_bytes(2, "big")
        out.append(tq)
        out += bytes(int(v) for v in qt)
    ncomp = len(planes)                                        # SOF0
    out += b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big")
    out += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out.append(ncomp)
    for c, (hi, vi) in enumerate(samp):
        out += bytes([c + 1, (hi << 4) | vi, qt_of[c]])
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)),        # DHT x2
                             (1, (_AC_BITS, _AC_VALS))):
        out += b"\xff\xc4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out.append(tc << 4)
        out += bytes(bits) + bytes(vals)
    if restart_interval:                                       # DRI
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big")    # SOS
    out.append(ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for c, ((hi, vi), plane) in enumerate(zip(samp, planes)):
            for by in range(vi):
                for bx in range(hi):
                    coefs = _fdct_quant(plane, qt_nat[qt_of[c]],
                                        my * vi + by, mx * hi + bx)
                    preds[c] = _encode_block(writer, coefs, preds[c],
                                             dc_codes, ac_codes)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)
