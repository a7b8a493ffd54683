"""Vendored dependency-free FLAC codec — stdlib + numpy only.

FLAC is lossless, so unlike the JPEG codec this round-trips BIT-EXACT:
``decode_flac(encode_flac(x)) == x`` is asserted sample-for-sample in
tests.

Decoder supports the real-world stream surface: fixed- and
variable-blocksize frames, all four subframe types (CONSTANT, VERBATIM,
FIXED orders 0-4, LPC orders 1-32), Rice-coded residuals in both 4- and
5-bit parameter widths including the raw-escape code, wasted-bits
shifting, all four channel assignments (independent, left/side,
right/side, mid/side), and CRC-8 / CRC-16 verification.  ID3v2 prefixes
and all metadata blocks are skipped (STREAMINFO is parsed).  8/12/16/
20/24-bit sample sizes decode; 32-bit raises (rare, spec-edge).

The encoder exists for fixtures and the audio re-encode path: it emits
valid fixed-blocksize streams with a selectable subframe strategy —
``verbatim`` (store), ``constant`` where a block is flat, ``fixed``
(order-2 polynomial predictor + Rice), or ``lpc`` (a fixed order-2
quantized-coefficient predictor + Rice, exercising the decoder's true
LPC path) — and optional mid/side stereo decorrelation.  Compression
quality is not a goal; validity and bit-exactness are.

Entropy coding is per-sample Python (fixture/test scale — documented,
same contract as the vendored JPEG codec); block math is numpy.

Reference parity note: the reference system has no media path; this
module belongs to the training-data-pipeline extension surface
(multimodal audio columns).
"""

from __future__ import annotations

import numpy as np

# --- CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005) ------

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --- bit I/O (MSB-first, no stuffing) ----------------------------------------

class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def bits(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("truncated FLAC stream (CRC desync or cut)")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.bits(0, 32)
            q -= 32
        self.bits(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)


# --- rice coding -------------------------------------------------------------

def _zigzag_fold(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _zigzag_unfold(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_write(w: _Writer, residual: list[int], param: int) -> None:
    for v in residual:
        u = _zigzag_fold(v)
        w.unary(u >> param)
        if param:
            w.bits(u, param)


def _rice_read(r: _Reader, n: int, param: int) -> list[int]:
    out = []
    for _ in range(n):
        q = r.unary()
        u = (q << param) | (r.bits(param) if param else 0)
        out.append(_zigzag_unfold(u))
    return out


# FIXED predictor coefficients by order (prediction of s[i] from history)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SIZE_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _read_utf8_number(r: _Reader) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 36 bits)."""
    first = r.bits(8)
    if first < 0x80:
        return first
    n = 0
    while (first << n) & 0x80:
        n += 1
    if n == 1 or n > 7:
        raise ValueError("invalid FLAC frame-number coding")
    v = first & (0x7F >> n)
    for _ in range(n - 1):
        c = r.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC frame-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(w: _Writer, v: int) -> None:
    """UTF-8-style encoding extended to 36 bits (T.141-ish, per the FLAC
    spec): 1 byte below 0x80, else a (0xFE..0xC0)-prefixed head byte and
    6-bit continuation bytes."""
    if v < 0x80:
        w.bits(v, 8)
        return
    for nbytes, limit in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                          (5, 1 << 26), (6, 1 << 31), (7, 1 << 36)):
        if v < limit:
            break
    else:
        raise ValueError("frame number exceeds 36 bits")
    cont = nbytes - 1
    if nbytes == 7:
        w.bits(0xFE, 8)
    else:
        head_payload_bits = 7 - nbytes
        prefix = (0xFF << (head_payload_bits + 1)) & 0xFF
        w.bits(prefix | (v >> (6 * cont)), 8)
    for g in range(cont - 1, -1, -1):
        w.bits(0x80 | ((v >> (6 * g)) & 0x3F), 8)


# --- decoder -----------------------------------------------------------------

def _read_subframe(r: _Reader, blocksize: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
        bps -= wasted
    if ftype == 0:                                   # CONSTANT
        samples = [r.signed(bps)] * blocksize
    elif ftype == 1:                                 # VERBATIM
        samples = [r.signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12 or ftype >= 32:            # FIXED / LPC
        if ftype >= 32:
            order = (ftype & 0x1F) + 1
        else:
            order = ftype - 8
        warm = [r.signed(bps) for _ in range(order)]
        if ftype >= 32:                              # LPC parameters
            prec = r.bits(4) + 1
            if prec == 16:
                raise ValueError("invalid FLAC LPC precision escape")
            shift = r.signed(5)
            coefs = [r.signed(prec) for _ in range(order)]
        else:
            shift = 0
            coefs = _FIXED_COEF[order]
        method = r.bits(2)
        if method > 1:
            raise ValueError("reserved FLAC residual coding method")
        pbits = 4 + method
        escape = (1 << pbits) - 1
        porder = r.bits(4)
        nparts = 1 << porder
        residual: list[int] = []
        for p in range(nparts):
            n = (blocksize >> porder) - (order if p == 0 else 0)
            if n < 0:
                raise ValueError("FLAC partition smaller than predictor order")
            param = r.bits(pbits)
            if param == escape:
                raw = r.bits(5)
                residual.extend(
                    r.signed(raw) if raw else 0 for _ in range(n))
            else:
                residual.extend(_rice_read(r, n, param))
        samples = list(warm)
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples.append(residual[i - order] + (pred >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    arr = np.array(samples, np.int64)
    if wasted:
        arr <<= wasted
    return arr


def decode_flac(content: bytes,
                max_samples: int | None = None) -> tuple[np.ndarray, int]:
    """FLAC decode -> (samples[n_frames, n_channels] int32, sample_rate).
    Verifies frame CRC-8/CRC-16; raises ValueError on corrupt or
    reserved-feature streams.

    Bomb guard (round 12 — the audio twin of the VP8L pixel budget): a
    CONSTANT subframe emits a whole blocksize (up to 65536 samples) for
    a handful of payload bytes, so a crafted frame train amplifies
    ~3000x into the pure-Python sample lists.  Decoded samples (summed
    across channels) are capped by the shared payload-tied budget
    (functions/_budget.py sample_budget — absolute cap 2^25, ~6 min of
    stereo CD audio; ``max_samples`` overrides), checked per frame
    BEFORE its subframes decode.  Truncated metadata/ID3 walks fold
    into the typed ValueError family (no untyped crash leaves the
    Arrow task)."""
    try:
        return _decode_flac(bytes(content), max_samples)
    except IndexError as exc:
        raise ValueError("truncated or malformed FLAC stream") from exc


def _decode_flac(content: bytes,
                 max_samples: int | None) -> tuple[np.ndarray, int]:
    from ._budget import sample_budget

    buf = bytes(content)
    if buf[:3] == b"ID3":                  # skip ID3v2 prefix (syncsafe size)
        sz = ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]) + 10
        buf = buf[sz:]
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:                            # metadata blocks
        header = buf[pos]
        btype, last = header & 0x7F, header & 0x80
        blen = int.from_bytes(buf[pos + 1:pos + 4], "big")
        body = buf[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:                     # STREAMINFO
            r = _Reader(body)
            r.bits(16); r.bits(16); r.bits(24); r.bits(24)
            rate = r.bits(20)
            nch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            info = (rate, nch, bps, total)
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    s_rate, s_nch, s_bps, s_total = info

    budget = sample_budget(len(buf), max_samples)
    produced = 0
    channels_out: list[list[np.ndarray]] = []
    while pos < len(buf):
        frame_start = pos
        r = _Reader(buf, pos * 8)
        sync = r.bits(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        r.bits(1)                          # reserved
        r.bits(1)                          # blocking strategy
        bs_code = r.bits(4)
        rate_code = r.bits(4)
        chan_code = r.bits(4)
        size_code = r.bits(3)
        r.bits(1)                          # reserved
        _read_utf8_number(r)
        if bs_code == 0b0110:
            blocksize = r.bits(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.bits(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if rate_code == 0:
            rate = s_rate
        elif rate_code == 0b1100:
            rate = r.bits(8) * 1000
        elif rate_code == 0b1101:
            rate = r.bits(16)
        elif rate_code == 0b1110:
            rate = r.bits(16) * 10
        elif rate_code in _RATE_TABLE:
            rate = _RATE_TABLE[rate_code]
        else:
            raise ValueError(f"invalid FLAC sample-rate code {rate_code}")
        bps = s_bps if size_code == 0 else _SIZE_TABLE.get(size_code)
        if bps is None:
            raise ValueError(f"reserved FLAC sample-size code {size_code}")
        header_end = r.pos >> 3    # header fields are byte-aligned here
        if crc8(buf[frame_start:header_end]) != r.bits(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        nch_frame = (chan_code + 1) if chan_code < 8 else 2
        produced += blocksize * nch_frame
        if produced > budget:
            raise ValueError(
                f"FLAC stream produces > {budget} samples for a "
                f"{len(buf)}-byte payload — rejected as a "
                "decompression bomb")
        if chan_code < 8:
            nch = chan_code + 1
            subs = [_read_subframe(r, blocksize, bps) for _ in range(nch)]
        elif chan_code in (8, 9, 10):
            # left/side: side gets +1 bit; right/side: side (ch0) +1;
            # mid/side: side (ch1) +1
            if chan_code == 8:
                subs = [_read_subframe(r, blocksize, bps),
                        _read_subframe(r, blocksize, bps + 1)]
                left, side = subs
                ch = [left, left - side]
            elif chan_code == 9:
                subs = [_read_subframe(r, blocksize, bps + 1),
                        _read_subframe(r, blocksize, bps)]
                side, right = subs
                ch = [right + side, right]
            else:
                subs = [_read_subframe(r, blocksize, bps),
                        _read_subframe(r, blocksize, bps + 1)]
                mid, side = subs
                mid2 = (mid << 1) | (side & 1)
                ch = [(mid2 + side) >> 1, (mid2 - side) >> 1]
            subs = ch
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        r.align()
        body_end = r.pos >> 3
        if crc16(buf[frame_start:body_end]) != r.bits(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = (r.pos + 7) >> 3
        channels_out.append([np.asarray(c, np.int64) for c in subs])

    if not channels_out:                   # frameless (empty) stream
        return np.zeros((0, s_nch), np.int32), s_rate
    nch = len(channels_out[0])
    cols = [np.concatenate([f[c] for f in channels_out]) for c in range(nch)]
    out = np.stack(cols, axis=1)
    if s_total:
        out = out[:s_total]
    return out.astype(np.int32), s_rate


# --- encoder -----------------------------------------------------------------

def _best_rice_param(residual: list[int], pbits: int) -> int:
    if not residual:
        return 0
    mean = sum(_zigzag_fold(v) for v in residual) / len(residual)
    param = max(0, int(mean).bit_length() - 1)
    return min(param, (1 << pbits) - 2)


def _write_residual(w: _Writer, residual: list[int]) -> None:
    # single partition (order 0), 4-bit rice parameter
    w.bits(0, 2)                   # method: 4-bit rice
    w.bits(0, 4)                   # partition order 0
    param = _best_rice_param(residual, 4)
    w.bits(param, 4)
    _rice_write(w, residual, param)


def _write_subframe(w: _Writer, samples: np.ndarray, bps: int,
                    strategy: str) -> None:
    s = [int(v) for v in samples]
    w.bits(0, 1)                   # padding
    if strategy == "constant" or (strategy == "auto" and len(set(s)) == 1):
        if len(set(s)) != 1:
            raise ValueError("constant subframe requested for non-flat block")
        w.bits(0, 6)
        w.bits(0, 1)               # no wasted bits
        w.bits(s[0], bps)
        return
    if strategy == "verbatim":
        w.bits(1, 6)
        w.bits(0, 1)
        for v in s:
            w.bits(v, bps)
        return
    if strategy in ("fixed", "auto"):
        order = min(2, len(s))
        w.bits(8 + order, 6)
        w.bits(0, 1)
        for v in s[:order]:
            w.bits(v, bps)
        coefs = _FIXED_COEF[order]
        residual = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(s))
        ]
        _write_residual(w, residual)
        return
    if strategy == "lpc":
        order = min(2, len(s))
        if order < 2:
            # verbatim fallback for blocks shorter than the predictor
            # order — inline, because the padding bit is already written
            # (a recursive _write_subframe call would emit it twice and
            # corrupt the stream)
            w.bits(1, 6)
            w.bits(0, 1)
            for v in s:
                w.bits(v, bps)
            return
        # fixed quantized predictor: pred = (3*s[i-1] - s[i-2]) >> 1
        coefs, shift, prec = [3, -1], 1, 4
        w.bits(32 + (order - 1), 6)
        w.bits(0, 1)
        for v in s[:order]:
            w.bits(v, bps)
        w.bits(prec - 1, 4)
        w.bits(shift, 5)
        for c in coefs:
            w.bits(c, prec)
        residual = [
            s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(s))
        ]
        _write_residual(w, residual)
        return
    raise ValueError(f"unknown subframe strategy {strategy!r}")


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                block_size: int = 4096, subframe: str = "auto",
                stereo: str = "independent") -> bytes:
    """Encode (n_frames, n_channels) integer samples as a FLAC stream.

    ``subframe``: "auto" (constant where flat, else fixed-order-2),
    "verbatim", "constant", "fixed", or "lpc".  ``stereo``: "independent"
    or "mid_side" (2-channel input only).  Lossless by construction.
    """
    arr = np.asarray(samples, np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if n and (arr.min() < lo or arr.max() > hi):
        raise ValueError(f"samples exceed {bits}-bit range")
    out = bytearray(b"fLaC")
    si = _Writer()
    si.bits(block_size, 16)
    si.bits(block_size, 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(sample_rate, 20)
    si.bits(nch - 1, 3)
    si.bits(bits - 1, 5)
    si.bits(n, 36)
    body = bytes(si.out) + b"\x00" * 16    # md5 unset (spec-permitted)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fno, start in enumerate(range(0, n, block_size)):
        block = arr[start:start + block_size]
        bs = block.shape[0]
        w = _Writer()
        w.bits(0b11111111111110, 14)
        w.bits(0, 1)
        w.bits(0, 1)                       # fixed-blocksize stream
        w.bits(0b0111, 4)                  # explicit 16-bit blocksize
        w.bits(0, 4)                       # rate: from STREAMINFO
        use_ms = stereo == "mid_side" and nch == 2
        w.bits(10 if use_ms else nch - 1, 4)
        w.bits({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        w.bits(0, 1)
        _write_utf8_number(w, fno)
        w.bits(bs - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.bits(crc8(hdr), 8)
        if use_ms:
            left = block[:, 0]
            right = block[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(w, mid, bits, subframe)
            _write_subframe(w, side, bits + 1, subframe)
        else:
            for c in range(nch):
                _write_subframe(w, block[:, c], bits, subframe)
        w.align()
        frame = bytes(w.out)
        w.bits(crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)
