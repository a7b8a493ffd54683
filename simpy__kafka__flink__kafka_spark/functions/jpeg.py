"""Vendored dependency-free JPEG codec (ITU-T T.81) — numpy + stdlib only.

Decoder supports what real-world JPEG files are: baseline/extended
sequential (SOF0/SOF1) AND progressive (SOF2) Huffman scans — spectral
selection, successive approximation (DC and the intricate AC refinement
path), EOB runs — with 8-bit samples, grayscale or YCbCr at arbitrary
sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers, and
multi-table DQT/DHT segments.  Arithmetic coding, hierarchical (SOF5+),
and 12-bit precision raise ``ValueError`` — honest unsupported-variant
errors, same contract as the vendored PNG decoder.

The encoder exists for two product reasons: it is the re-encode side of
``resize_image`` for JPEG payloads, and it generates valid fixtures in
tests without any imaging library.  It emits baseline 4:4:4 / 4:2:0 or,
with ``progressive=True``, a 4-stage SOF2 scan script (DC first at
Al=1, DC refinement, per-component AC first at Al=1, per-component AC
refinement) that exercises every progressive decode path including
EOBRUN and the AC correction bits.  It uses a *fixed, simple* canonical
Huffman table (every DC category at 5 bits, every AC run/size symbol at
9 bits): JPEG stores the Huffman tables in the file (DHT), so any valid
prefix code round-trips, and the fixed-width code keeps the table
construction trivially auditable.  Compression ratio is not a goal of
this vendored path; a production deployment swaps libjpeg-turbo in at
the same ``decode_image`` seam.

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
        if (self.pos >> 3) >= len(self.data):
            raise ValueError("truncated JPEG scan data")
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

class _Frame:
    """Per-image decode state: frame header + per-component coefficient
    arrays accumulated across scans (one scan for sequential files, many
    for progressive)."""

    def __init__(self, h: int, w: int, comps: list[tuple[int, int, int, int]],
                 progressive: bool):
        self.h, self.w, self.comps = h, w, comps
        self.progressive = progressive
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        # MCU-padded coefficient grids (non-interleaved scans address the
        # smaller true block grid inside them)
        self.coefs = [
            np.zeros((self.mcus_y * vi, self.mcus_x * hi, 64), np.int32)
            for _, hi, vi, _ in comps
        ]

    def block_grid(self, ci: int) -> tuple[int, int]:
        """True (non-interleaved) block dims of component ci."""
        _, hi, vi, _ = self.comps[ci]
        cw = -(-self.w * hi // self.hmax)
        ch = -(-self.h * vi // self.vmax)
        return -(-ch // 8), -(-cw // 8)


def _split_ecs(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded segment starting at ``pos`` at RSTn
    markers, un-stuffing 0xFF00; returns (segments, index of the next
    non-RST marker's 0xFF)."""
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
    return segments, i


def _refine_nonzero(r: _BitReader, coef: np.ndarray, zz: int, p1: int) -> None:
    """AC successive-approximation correction bit for a known-nonzero
    coefficient (two's-complement OR semantics, per G.1.2.3)."""
    if r.read_bit():
        c = int(coef[zz])
        if (c & p1) == 0:
            coef[zz] = c + (p1 if c >= 0 else -p1)


def _decode_scan(frame: _Frame, sel: list[tuple[int, int, int]],
                 huff: dict[tuple[int, int], dict[tuple[int, int], int]],
                 segments: list[bytes], restart: int,
                 Ss: int, Se: int, Ah: int, Al: int) -> None:
    """Decode one scan (sequential or any progressive stage) into the
    frame's coefficient arrays."""
    interleaved = len(sel) > 1
    if interleaved:
        units_total = frame.mcus_x * frame.mcus_y
    else:
        bh, bw = frame.block_grid(sel[0][0])
        units_total = bh * bw
    unit = 0
    for seg in segments:
        reader = _BitReader(seg)
        preds = [0] * len(frame.comps)
        eobrun = 0
        n_in_seg = restart if restart else (units_total - unit)
        for _ in range(min(n_in_seg, units_total - unit)):
            if interleaved:
                my, mx = divmod(unit, frame.mcus_x)
                for ci, td, ta in sel:
                    _, hi, vi, _ = frame.comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            eobrun, preds[ci] = _decode_block(
                                frame.coefs[ci], my * vi + by, mx * hi + bx,
                                reader, huff, td, ta, Ss, Se, Ah, Al,
                                eobrun, preds[ci])
            else:
                ci, td, ta = sel[0]
                by, bx = divmod(unit, bw)
                eobrun, preds[ci] = _decode_block(
                    frame.coefs[ci], by, bx, reader, huff, td, ta,
                    Ss, Se, Ah, Al, eobrun, preds[ci])
            unit += 1


def _decode_block(coefs: np.ndarray, by: int, bx: int, r: _BitReader,
                  huff: dict, td: int, ta: int, Ss: int, Se: int,
                  Ah: int, Al: int, eobrun: int, pred: int) -> tuple[int, int]:
    """Decode one block's contribution for the current scan stage.
    Returns (eobrun, pred) carried to the next block."""
    coef = coefs[by, bx]
    if Ss == 0:
        if Ah == 0:                       # DC first (or sequential DC)
            s = r.decode(huff[(0, td)])
            diff = _extend(r.read_bits(s), s) if s else 0
            pred += diff
            coef[0] = pred << Al
        else:                             # DC refinement: one bit
            if r.read_bit():
                coef[0] = int(coef[0]) | (1 << Al)
        if Se == 0:
            return eobrun, pred
        k = 1                             # sequential: AC follows in-block
    else:
        k = Ss
    ac = huff[(1, ta)]
    p1 = 1 << Al
    if Ah == 0:                           # AC first pass (or sequential AC)
        if eobrun > 0:
            return eobrun - 1, pred
        while k <= Se:
            rs = r.decode(ac)
            run, s = rs >> 4, rs & 15
            if s == 0:
                if run == 15:             # ZRL
                    k += 16
                    continue
                eobrun = 1 << run
                if run:
                    eobrun += r.read_bits(run)
                return eobrun - 1, pred   # current block counted
            k += run
            if k > Se:
                raise ValueError("JPEG AC index overflow")
            coef[ZIGZAG[k]] = _extend(r.read_bits(s), s) << Al
            k += 1
        return eobrun, pred
    # AC refinement (G.1.2.3)
    if eobrun == 0:
        while k <= Se:
            rs = r.decode(ac)
            run, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if run != 15:             # EOB run begins
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # run == 15: ZRL over 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                val = p1 if r.read_bit() else -p1
            while k <= Se:
                zz = int(ZIGZAG[k])
                if coef[zz] != 0:
                    _refine_nonzero(r, coef, zz, p1)
                else:
                    if run == 0:
                        if val:
                            coef[zz] = val
                        k += 1
                        break
                    run -= 1
                k += 1
    if eobrun > 0:
        # correction bits for the remaining nonzero coefs of this block
        while k <= Se:
            zz = int(ZIGZAG[k])
            if coef[zz] != 0:
                _refine_nonzero(r, coef, zz, p1)
            k += 1
        eobrun -= 1
    return eobrun, pred


def decode_jpeg(content: bytes,
                max_pixels: int | None = None) -> np.ndarray:
    """Sequential (SOF0/SOF1) or progressive (SOF2) JPEG decode ->
    (height, width, 3) uint8.  Grayscale images are replicated to 3
    channels (same contract as the other vendored decoders).  Raises
    ValueError on arithmetic-coded / hierarchical / non-8-bit streams.
    SOF dims are budget-gated BEFORE the MCU coefficient grids allocate
    (functions/_budget.py — round-12 sweep), and any residual
    index-out-of-range from a malformed stream folds into the typed
    ValueError family (the scan walker indexes segment bytes in many
    places; an adversarial stream must never leak an untyped crash
    out of the Arrow task)."""
    try:
        return _decode_jpeg(bytes(content), max_pixels)
    except (IndexError, KeyError, ZeroDivisionError) as exc:
        # truncated segments index past buffers; mutated streams
        # reference undefined quant/Huffman table ids — both are
        # malformed input, not decoder state
        raise ValueError("truncated or malformed JPEG stream") from exc


def _decode_jpeg(content: bytes, max_pixels: int | None) -> np.ndarray:
    buf = bytes(content)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame: _Frame | None = None
    restart = 0
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the stream
        # before a marker code — skip them so a padded real-world stream
        # doesn't misread a fill byte as the marker
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(buf):
            break
        marker = buf[pos + 1]
        if marker == 0xD9:          # EOI
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
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0 / SOF1 / SOF2
            if data[0] != 8:
                raise ValueError(f"unsupported JPEG precision {data[0]}")
            h = int.from_bytes(data[1:3], "big")
            w = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c], data[7 + 3 * c], data[8 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                # T.81 B.2.2: sampling factors are 1..4; 0 would divide
                # by zero in the upsample arithmetic (fuzz finding)
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            from ._budget import check_pixels

            check_pixels("JPEG SOF", w, h, len(buf), max_pixels)
            frame = _Frame(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(sequential and progressive Huffman only)"
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
                idx = next((i for i, comp in enumerate(frame.comps)
                            if comp[0] == cs), None)
                if idx is None:
                    raise ValueError(
                        f"JPEG scan references undeclared component {cs}")
                sel.append((idx, tt >> 4, tt & 15))
            Ss, Se = data[1 + 2 * ns], data[2 + 2 * ns]
            AhAl = data[3 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 15
            if not frame.progressive:
                Ss, Se, Ah, Al = 0, 63, 0, 0
            segments, pos = _split_ecs(buf, pos)
            _decode_scan(frame, sel, huff, segments, restart, Ss, Se, Ah, Al)
        # APPn / COM / others: skipped via seglen
    if frame is None:
        raise ValueError("JPEG missing SOF")

    # dequantize + IDCT + assemble (vectorized over all blocks at once)
    h, w = frame.h, frame.w
    full = []
    for ci, (cid, hi, vi, tq) in enumerate(frame.comps):
        # DQT stores zigzag order; scatter to the natural-order 8x8 table
        # (the zigzag permutation is NOT an involution — a gather here
        # would permute the table and break interop with real encoders)
        qn = np.empty(64, np.float64)
        qn[ZIGZAG] = qtables[tq].astype(np.float64)
        grid = frame.coefs[ci]
        bh, bw = grid.shape[:2]
        blocks = grid.astype(np.float64) * qn
        blocks = blocks.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,xyjk,kl->xyil", _A.T, blocks, _A) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        up = np.repeat(np.repeat(plane, frame.vmax // vi, axis=0),
                       frame.hmax // hi, axis=1)
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

def _encode_block(writer: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict[int, tuple[int, int]],
                  ac_codes: dict[int, tuple[int, int]]) -> int:
    """Sequential: DC diff + AC run-length for one zigzag block."""
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


class _ACFirstEncoder:
    """Progressive AC first pass (G.1.2.2): run-length with EOB runs
    deferred across blocks; values magnitude-shifted by Al."""

    def __init__(self, writer: _BitWriter, ac_codes: dict, Al: int):
        self.w, self.ac, self.Al = writer, ac_codes, Al
        self.eobrun = 0

    def _emit_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0

    def block(self, zz: np.ndarray) -> None:
        vals = [0] * 64
        last = 0
        for k in range(1, 64):
            v = int(zz[k])
            m = (abs(v) >> self.Al)
            vals[k] = m if v >= 0 else -m       # magnitude shift (not arith)
            if vals[k]:
                last = k
        if last == 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()
            return
        self._emit_eobrun()
        run = 0
        for k in range(1, last + 1):
            v = vals[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = self.ac[0xF0]
                self.w.write(code, length)
                run -= 16
            s = _category(v)
            code, length = self.ac[(run << 4) | s]
            self.w.write(code, length)
            self.w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()

    def finish(self) -> None:
        self._emit_eobrun()


class _ACRefineEncoder:
    """Progressive AC refinement (G.1.2.3), written as an exact mirror of
    the decoder's advance loop so correction bits land precisely where the
    decoder reads them: a ZRL carries only the correction bits for history
    positions passed before its 16th zero; a significance symbol carries
    sign + the bits passed en route to the inserted position; everything
    after the last newly-significant position defers into an EOB run whose
    correction bits follow the (possibly multi-block) EOB code."""

    def __init__(self, writer: _BitWriter, ac_codes: dict, Al: int):
        self.w, self.ac, self.Al = writer, ac_codes, Al
        self.eobrun = 0
        self.pending: list[int] = []      # correction bits deferred with EOB

    def _emit_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pending:
                self.w.write(b, 1)
            self.pending = []

    def block(self, zz: np.ndarray) -> None:
        Al = self.Al
        mag = [abs(int(zz[k])) >> Al for k in range(64)]
        k = 1
        while True:
            t = next((j for j in range(k, 64) if mag[j] == 1), None)
            if t is None:
                break
            run = sum(1 for j in range(k, t) if mag[j] == 0)
            while run > 15:
                self._emit_eobrun()
                code, length = self.ac[0xF0]
                self.w.write(code, length)
                consumed = 0
                while consumed < 16:      # decoder's ZRL advance, mirrored
                    if mag[k] > 1:
                        self.w.write(mag[k] & 1, 1)
                    else:
                        consumed += 1
                    k += 1
                run -= 16
            self._emit_eobrun()
            code, length = self.ac[(run << 4) | 1]
            self.w.write(code, length)
            self.w.write(1 if int(zz[t]) > 0 else 0, 1)
            while k < t:                  # bits read during the advance
                if mag[k] > 1:
                    self.w.write(mag[k] & 1, 1)
                k += 1
            k = t + 1
        if k <= 63:                        # trailing band -> EOB run
            self.eobrun += 1
            self.pending.extend(mag[j] & 1 for j in range(k, 64)
                                if mag[j] > 1)
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()

    def finish(self) -> None:
        self._emit_eobrun()


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _color_planes(px: np.ndarray, subsampling: str):
    gray = px.ndim == 2
    if gray:
        return [px], [(1, 1)]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsampling == "4:2:0":
        ph, pw = _pad_to(cb, 2, 2).shape
        cb2 = _pad_to(cb, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        cr2 = _pad_to(cr, 2, 2).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        return [y, cb2, cr2], [(2, 2), (1, 1), (1, 1)]
    if subsampling == "4:4:4":
        return [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    raise ValueError(f"unsupported subsampling {subsampling!r}")


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "4:4:4", restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as JPEG.
    ``subsampling`` is ``"4:4:4"`` or ``"4:2:0"`` (ignored for
    grayscale).  ``restart_interval`` > 0 emits DRI + RSTn markers
    (sequential mode only).  ``progressive=True`` emits a 4-stage SOF2
    scan script: DC first (Al=1), DC refinement, then per-component AC
    first (Al=1) and AC refinement scans."""
    px = np.asarray(pixels, np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    planes, samp = _color_planes(px, subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.pad(p,
               ((0, mcus_y * vi * 8 - p.shape[0]),
                (0, mcus_x * hi * 8 - p.shape[1])), mode="edge")
        for p, (hi, vi) in zip(planes, samp)
    ]

    # _QUANT_* literals are NATURAL (row-major) order, per Annex K's
    # presentation; the DQT segment stores zigzag order (gathered below)
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)
    qts = [qluma] + ([] if gray else [qchroma])
    qt_of = [0] + ([] if gray else [1, 1])
    qt_nat = [qt.reshape(8, 8).astype(np.float64) for qt in qts]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    ncomp = len(planes)

    # precompute every block's quantized zigzag coefficients (vectorized:
    # one einsum per component; zz_of[c][(by, bx)] -> 64-vector)
    zz_of: list[np.ndarray] = []
    grids: list[tuple[int, int]] = []
    for c, ((hi, vi), plane) in enumerate(zip(samp, planes)):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        grids.append((bh, bw))
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = np.rint(
            np.einsum("ij,xyjk,kl->xyil", _A, blocks, _A.T)
            / qt_nat[qt_of[c]]
        ).astype(np.int64)
        zz_of.append(coefs.reshape(bh, bw, 64)[:, :, ZIGZAG])

    out = bytearray(b"\xff\xd8")                               # SOI
    for tq, qt in enumerate(qts):                              # DQT (zigzag)
        out += b"\xff\xdb" + (3 + 64).to_bytes(2, "big")
        out.append(tq)
        out += bytes(int(v) for v in qt[ZIGZAG])
    sof = 0xC2 if progressive else 0xC0                        # SOF0 / SOF2
    out += bytes([0xFF, sof]) + (8 + 3 * ncomp).to_bytes(2, "big")
    out += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out.append(ncomp)
    for c, (hi, vi) in enumerate(samp):
        out += bytes([c + 1, (hi << 4) | vi, qt_of[c]])
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)),        # DHT x2
                             (1, (_AC_BITS, _AC_VALS))):
        out += b"\xff\xc4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out.append(tc << 4)
        out += bytes(bits) + bytes(vals)

    def sos_header(comp_ids: list[int], Ss: int, Se: int,
                   Ah: int, Al: int) -> bytes:
        seg = bytearray(b"\xff\xda")
        seg += (6 + 2 * len(comp_ids)).to_bytes(2, "big")
        seg.append(len(comp_ids))
        for cid in comp_ids:
            seg += bytes([cid + 1, 0x00])
        seg += bytes([Ss, Se, (Ah << 4) | Al])
        return bytes(seg)

    if not progressive:
        if restart_interval:                                   # DRI
            out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
        out += sos_header(list(range(ncomp)), 0, 63, 0, 0)
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
            for c, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        zz = zz_of[c][(my * vi + by, mx * hi + bx)]
                        preds[c] = _encode_block(writer, zz, preds[c],
                                                 dc_codes, ac_codes)
        writer.flush()
        out += writer.out
        out += b"\xff\xd9"
        return bytes(out)

    # --- progressive scan script ---------------------------------------------
    # scan 1: DC first, interleaved, Al=1 (arithmetic shift of the diff chain)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * ncomp
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for c, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    dc = int(zz_of[c][(my * vi + by, mx * hi + bx)][0]) >> 1
                    diff = dc - preds[c]
                    preds[c] = dc
                    s = _category(diff)
                    code, length = dc_codes[s]
                    writer.write(code, length)
                    if s:
                        writer.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s)
    writer.flush()
    out += writer.out
    # scan 2: DC refinement (one raw bit per block)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    writer = _BitWriter()
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for c, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    writer.write(
                        int(zz_of[c][(my * vi + by, mx * hi + bx)][0]) & 1, 1)
    writer.flush()
    out += writer.out
    # scans 3..: per-component AC first (Al=1), then AC refinement (Al=0).
    # Non-interleaved scans address the component's TRUE block grid
    # (ceil(comp dims / 8)), which can be smaller than the MCU-padded grid
    # the blocks were computed on.
    def true_grid(c: int) -> tuple[int, int]:
        hi, vi = samp[c]
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        return -(-ch // 8), -(-cw // 8)

    for c in range(ncomp):
        bh, bw = true_grid(c)
        out += sos_header([c], 1, 63, 0, 1)
        writer = _BitWriter()
        enc = _ACFirstEncoder(writer, ac_codes, Al=1)
        for by in range(bh):
            for bx in range(bw):
                enc.block(zz_of[c][(by, bx)])
        enc.finish()
        writer.flush()
        out += writer.out
    for c in range(ncomp):
        bh, bw = true_grid(c)
        out += sos_header([c], 1, 63, 1, 0)
        writer = _BitWriter()
        ref = _ACRefineEncoder(writer, ac_codes, Al=0)
        for by in range(bh):
            for bx in range(bw):
                ref.block(zz_of[c][(by, bx)])
        ref.finish()
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --- EXIF metadata walk ------------------------------------------------------

EXIF_TAG_MAKE = 271
EXIF_TAG_MODEL = 272
EXIF_TAG_ORIENTATION = 274
EXIF_TAG_DATETIME = 306
EXIF_TAG_EXIF_IFD = 34665
EXIF_TAG_DT_ORIGINAL = 36867


def jpeg_exif(content: bytes) -> dict:
    """EXIF metadata of a JPEG: scan the marker stream for the APP1
    segment starting ``Exif\\0\\0``, then walk the embedded TIFF IFD0
    (and the Exif sub-IFD when pointed to) via the SHARED tiff.py IFD
    rendering (walk_ifd / tiff_byte_order — one IFD walk in the repo).
    Orientation is the tag image-training pipelines MUST apply before
    any pixel op (a rotated-by-metadata image hashes/augments wrong
    otherwise).

    Returns {has_exif, orientation, make, model, datetime,
    datetime_original} — has_exif 0 with null fields when no APP1/Exif
    segment exists (the keep-empty contract); malformed EXIF raises
    the typed ValueError family like every header walk."""
    from .tiff import ifd_ints, tiff_byte_order, walk_ifd

    buf = bytes(content)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    none = {"has_exif": 0, "orientation": None, "make": None,
            "model": None, "datetime": None, "datetime_original": None}
    pos = 2
    tiff = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost in EXIF scan")
        marker = buf[pos + 1]
        if marker == 0xD9:          # EOI: image complete — crawled JPEGs
            break                   # commonly carry trailing bytes after it
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:          # SOS: entropy data follows, stop
            break
        seg_len = int.from_bytes(buf[pos + 2: pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(buf):
            raise ValueError("JPEG segment length outside buffer")
        if marker == 0xE1 and buf[pos + 4: pos + 10] == b"Exif\x00\x00":
            tiff = buf[pos + 10: pos + 2 + seg_len]
            break
        pos += 2 + seg_len
    if tiff is None:
        return none

    def ascii_of(entry) -> str | None:
        if entry is None:
            return None
        typ, _cnt, raw = entry
        if typ != 2:
            return None
        return raw.split(b"\0", 1)[0].decode("ascii", errors="replace")

    bo = tiff_byte_order(tiff)
    ifd0 = walk_ifd(tiff, bo, int.from_bytes(tiff[4:8], bo))
    orientation = None
    if EXIF_TAG_ORIENTATION in ifd0:
        typ, _c, raw = ifd0[EXIF_TAG_ORIENTATION]
        vals = ifd_ints(typ, raw, bo)
        orientation = vals[0] if vals else None
        # EXIF defines orientations 1..8; an attacker LONG/RATIONAL
        # value past int32 crashed the Arrow Int32 cast untyped
        # (review find) — out-of-range reads as absent
        if orientation is not None and not 1 <= orientation <= 8:
            orientation = None
    dt_orig = None
    if EXIF_TAG_EXIF_IFD in ifd0:
        typ, _c, raw = ifd0[EXIF_TAG_EXIF_IFD]
        ptrs = ifd_ints(typ, raw, bo)
        if ptrs:
            sub = walk_ifd(tiff, bo, ptrs[0])
            dt_orig = ascii_of(sub.get(EXIF_TAG_DT_ORIGINAL))
    return {
        "has_exif": 1,
        "orientation": orientation,
        "make": ascii_of(ifd0.get(EXIF_TAG_MAKE)),
        "model": ascii_of(ifd0.get(EXIF_TAG_MODEL)),
        "datetime": ascii_of(ifd0.get(EXIF_TAG_DATETIME)),
        "datetime_original": dt_orig,
    }


def build_exif_app1(orientation: int, make: str, model: str,
                    datetime: str, datetime_original: str) -> bytes:
    """Hand-built APP1/Exif segment (little-endian TIFF, IFD0 with
    orientation/make/model/datetime + an Exif sub-IFD carrying
    DateTimeOriginal) — the FIXTURE writer for the EXIF walk; built
    from the spec layout independently of the reader's offsets, so a
    reader bug cannot be mirrored by construction order."""
    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little") + val.ljust(4, b"\0")[:4])

    strings = {}
    blob = b""
    # IFD0: 5 entries + next-IFD pointer; sub-IFD follows; then strings
    ifd0_off = 8
    ifd0_size = 2 + 5 * 12 + 4
    sub_off = ifd0_off + ifd0_size
    sub_size = 2 + 1 * 12 + 4
    str_off = sub_off + sub_size
    for key, s in (("make", make), ("model", model),
                   ("datetime", datetime), ("dto", datetime_original)):
        b = s.encode("ascii") + b"\0"
        if len(b) <= 4:
            # TIFF rule: values of <= 4 bytes live INLINE in the entry
            strings[key] = (None, b)
        else:
            strings[key] = (str_off + len(blob), b)
            blob += b

    def s_entry(tag: int, key: str) -> bytes:
        off, b = strings[key]
        val = b if off is None else off.to_bytes(4, "little")
        return entry(tag, 2, len(b), val)

    ifd0 = (5).to_bytes(2, "little")
    ifd0 += s_entry(EXIF_TAG_MAKE, "make")
    ifd0 += s_entry(EXIF_TAG_MODEL, "model")
    ifd0 += entry(EXIF_TAG_ORIENTATION, 3, 1,
                  orientation.to_bytes(2, "little"))
    ifd0 += s_entry(EXIF_TAG_DATETIME, "datetime")
    ifd0 += entry(EXIF_TAG_EXIF_IFD, 4, 1, sub_off.to_bytes(4, "little"))
    ifd0 += (0).to_bytes(4, "little")
    sub = (1).to_bytes(2, "little")
    sub += s_entry(EXIF_TAG_DT_ORIGINAL, "dto")
    sub += (0).to_bytes(4, "little")
    tiff = (b"II" + (42).to_bytes(2, "little")
            + ifd0_off.to_bytes(4, "little") + ifd0 + sub + blob)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def jpeg_exif_stats(media, id_col: str = "doc_id",
                    content_col: str = "content"):
    """Arrow-batched :func:`jpeg_exif` over binary payloads — the
    orientation/provenance triage an image-training pipeline runs
    before any decode.  Output: (id_col, has_exif, orientation, make,
    model, datetime, datetime_original)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("has_exif", T.IntegerType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("datetime", T.StringType(), True),
        T.StructField("datetime_original", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[content_col].map(lambda b: jpeg_exif(bytes(b)))
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "has_exif": o.map(lambda d: d["has_exif"]).astype("int32"),
                "orientation": o.map(lambda d: d["orientation"])
                .astype("Int32"),
                "make": o.map(lambda d: d["make"]),
                "model": o.map(lambda d: d["model"]),
                "datetime": o.map(lambda d: d["datetime"]),
                "datetime_original": o.map(lambda d: d["datetime_original"]),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)
