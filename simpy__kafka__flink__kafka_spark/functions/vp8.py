"""VP8 (lossy WebP) key-frame intra codec — pure Python/numpy, the
round-12 closing of the "lossy-VP8 pixel decode" seam documented at
``functions/multimodal.py`` (decode_image) since the multimodal wave.

No reference counterpart exists (the reference repo at
/root/reference has no media codecs); this is a beyond-reference
training-data-pipeline extension, built from the PUBLIC VP8 bitstream
description (RFC 6386) the same way ``vp8l.py`` was built from the
public lossless-WebP format description.

Honesty of the parity claim (the vp8l.py posture, stated precisely):

* STRUCTURAL parity with RFC 6386 key frames: the boolean arithmetic
  coder pair (§7's exact algorithm — split = 1 + ((range-1)*p >> 8),
  carry-propagating encoder, 16-bit decoder window), frame tag +
  sync + 14-bit dims, bool-coded first partition layout (color
  space/clamping, segmentation flag, filter header, token-partition
  count, 7-bit quant index + 5 signed deltas, refresh-entropy bit,
  4x8x3x11 coefficient-probability update flags, mb_no_coeff_skip),
  per-MB intra mode trees, the 12-leaf coefficient token tree with
  coefficient bands / zigzag / cat1..6 extra-bit categories, the
  skip-EOB-node rule after a ZERO token, the 0/1/2+ token context
  chain, above/left nonzero contexts, Y2/WHT second-order DC
  transform, and the exact integer inverse DCT/WHT (20091/35468
  multipliers, (x+4)>>3 and (x+3)>>3 roundings).
* VENDORED RFC TABLES (round 13): the §14.1 quantizer lookups are
  now the real ``DC_QLOOKUP``/``AC_QLOOKUP`` 128-entry tables (with
  the structural relations y2dc=2*dc, y2ac=31*ac/20 min 8, uvdc
  capped at 132), pinned in tests by the spec's invariants and
  anchor values.
* ONE ENGINE-PINNED table remains, and the seam is now FORMALLY
  CLOSED as a typed refusal (round 14, VERDICT r13 task 4): the
  default token probabilities (``DEFAULT_COEFF_PROBS`` — RFC 6386
  §13.5's 4x8x3x11 blob is 1056 opaque values with no re-derivable
  structure to cross-check a vendored copy against in this offline
  container, and a silently wrong copy would CLAIM interop while
  mis-decoding, which is worse than a loud refusal; the module
  instead uses a deterministic seeded schedule, varied across
  (type, band, ctx) so a context-selection bug flips the roundtrip,
  pinned by checksum test).  The closure mechanism: this engine's
  encoder/decoder boolean-coder shift mirror consumes every
  partition EXACTLY, so the decoder refuses any stream whose
  partitions show consumption drift — which a stream encoded
  against the real §13.5 defaults (libvpx) exhibits with
  overwhelming probability for any non-trivial token mass.  A
  foreign lossy WebP therefore gets the typed
  ``vp8-default-coeff-probs`` seam error, never silent garbage
  pixels; the residual false-accept (every partition of a foreign
  stream landing exactly on its boundary with zero overreads) is
  sketch-grade.  Everything encoded by :func:`encode_vp8` decodes
  bit-exactly and the full structural machinery is exercised either
  way; a future environment with libvpx present can finish the
  interop story by replacing ONE table and dropping the refusal.

Typed seams (ValueError, never a crash class): interframes, B_PRED
macroblocks, segmentation-enabled streams, loop-filtered streams
(filter_level > 0 — this decoder does not implement the loop filter
and refuses rather than silently mis-reconstructing).  Decode is
budget-gated via functions/_budget.py BEFORE any allocation (the
14-bit dims field is attacker-controlled: 16383x16383 = 2^28 px).
"""

from __future__ import annotations

import struct

import numpy as np

from ._budget import check_pixels

# ---------------------------------------------------------------- trees

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

# RFC 6386 §8.2 kf ymode tree (B_PRED leaf first) + kf probabilities.
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UVMODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UVMODE_PROBS = (142, 114, 183)

# Token alphabet (RFC 6386 §13.2).
ZERO_T, ONE_T, TWO_T, THREE_T, FOUR_T = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, EOB_T = 5, 6, 7, 8, 9, 10, 11
COEF_TREE = (
    -EOB_T, 2,
    -ZERO_T, 4,
    -ONE_T, 6,
    8, 12,
    -TWO_T, 10,
    -THREE_T, -FOUR_T,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}
CAT_PROBS = {
    CAT1: (159,),
    CAT2: (165, 145),
    CAT3: (173, 148, 140),
    CAT4: (176, 155, 140, 135),
    CAT5: (180, 157, 141, 134, 130),
    CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
MAX_LEVEL = CAT_BASE[CAT6] + (1 << len(CAT_PROBS[CAT6])) - 1  # 2114

COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Block types (plane indices into the coefficient probability table):
# 0 = Y after a Y2 block (tokens start at coefficient 1), 1 = Y2,
# 2 = chroma, 3 = Y with DC (B_PRED — a typed seam here, slot kept so
# the table shape matches the bitstream's update-flag walk).
PLANE_Y_NO_DC, PLANE_Y2, PLANE_UV, PLANE_Y_DC = 0, 1, 2, 3


def _pinned_coeff_probs() -> np.ndarray:
    """The engine-pinned default token probability table, 4x8x3x11.

    Deliberately VARIED across every (type, band, ctx, node) via a
    fixed multiplicative hash so that a wrong band/context/plane
    selection on either side of the codec lands on a different
    probability and flips downstream bits (a uniform table would make
    context bugs invisible to the roundtrip oracle).  Values stay in
    [16, 240] so no node is near-deterministic.  Checksum-pinned by
    tests/test_vp8.py."""
    probs = np.empty((4, 8, 3, 11), dtype=np.uint8)
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    h = (t * 2654435761 + b * 40503 + c * 2246822519
                         + n * 3266489917) & 0xFFFFFFFF
                    probs[t, b, c, n] = 16 + (h >> 8) % 225
    return probs


DEFAULT_COEFF_PROBS = _pinned_coeff_probs()
# Update-flag probabilities: 255 everywhere (the flag is read with
# prob-of-zero 255, so "no update" costs ~0 bits — the keyframe
# encoder never updates).
COEF_UPDATE_PROB = 255


# RFC 6386 §14.1 quantizer lookup tables (vendored round 13 —
# replacing the engine-pinned schedules): dc_qlookup / ac_qlookup,
# 128 entries each, indexed by the clamped quantizer index.  Pinned
# in tests by the spec's structural invariants (nondecreasing, both
# start at 4, dc plateaus at the doubled entries 10/17/20/21/22/23/
# 25/37/46/76, endpoints dc[127]=177 and ac[127]=284) plus anchor
# values.
DC_QLOOKUP = (
    4,   5,   6,   7,   8,   9,   10,  10,
    11,  12,  13,  14,  15,  16,  17,  17,
    18,  19,  20,  20,  21,  21,  22,  22,
    23,  23,  24,  25,  25,  26,  27,  28,
    29,  30,  31,  32,  33,  34,  35,  36,
    37,  37,  38,  39,  40,  41,  42,  43,
    44,  45,  46,  46,  47,  48,  49,  50,
    51,  52,  53,  54,  55,  56,  57,  58,
    59,  60,  61,  62,  63,  64,  65,  66,
    67,  68,  69,  70,  71,  72,  73,  74,
    75,  76,  76,  77,  78,  79,  80,  81,
    82,  83,  84,  85,  86,  87,  88,  89,
    91,  93,  95,  96,  98,  100, 101, 102,
    104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 134, 138, 142,
    146, 150, 154, 158, 162, 167, 172, 177,
)
AC_QLOOKUP = (
    4,   5,   6,   7,   8,   9,   10,  11,
    12,  13,  14,  15,  16,  17,  18,  19,
    20,  21,  22,  23,  24,  25,  26,  27,
    28,  29,  30,  31,  32,  33,  34,  35,
    36,  37,  38,  39,  40,  41,  42,  43,
    44,  45,  46,  47,  48,  49,  50,  51,
    52,  53,  54,  55,  56,  57,  58,  60,
    62,  64,  66,  68,  70,  72,  74,  76,
    78,  80,  82,  84,  86,  88,  90,  92,
    94,  96,  98,  100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128,
    131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177,
    181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245,
    249, 254, 259, 264, 269, 274, 279, 284,
)


def _dc_q(qi: int) -> int:
    """RFC 6386 §14.1 luma DC quantizer (vendored lookup)."""
    return DC_QLOOKUP[max(0, min(127, qi))]


def _ac_q(qi: int) -> int:
    """RFC 6386 §14.1 AC quantizer (vendored lookup)."""
    return AC_QLOOKUP[max(0, min(127, qi))]


def _quantizers(y_ac_qi: int, y_dc_d: int, y2_dc_d: int, y2_ac_d: int,
                uv_dc_d: int, uv_ac_d: int) -> dict:
    """All six quantizer values from the frame's index + deltas, with
    the RFC's structural relations (y2dc doubled, y2ac 31/20 floored
    at 8, uvdc capped at 132)."""
    def clamp_qi(v: int) -> int:
        return max(0, min(127, v))

    ydc = _dc_q(clamp_qi(y_ac_qi + y_dc_d))
    yac = _ac_q(clamp_qi(y_ac_qi))
    y2dc = _dc_q(clamp_qi(y_ac_qi + y2_dc_d)) * 2
    y2ac = max(8, (_ac_q(clamp_qi(y_ac_qi + y2_ac_d)) * 31) // 20)
    uvdc = min(132, _dc_q(clamp_qi(y_ac_qi + uv_dc_d)))
    uvac = _ac_q(clamp_qi(y_ac_qi + uv_ac_d))
    return {"ydc": ydc, "yac": yac, "y2dc": y2dc, "y2ac": y2ac,
            "uvdc": uvdc, "uvac": uvac}


# ------------------------------------------------------ boolean coder


class _BoolDecoder:
    """RFC 6386 §7.2 boolean decoder.  Reads past the partition end
    feed zeros (the spec's own tolerance) — termination is guaranteed
    structurally (every token loop is bounded by block/coefficient
    counts, which are bounded by the budget-gated dims).
    ``zero_feeds`` and ``unconsumed()`` expose the consumption drift
    the foreign-stream detector checks at decode end."""

    __slots__ = ("_d", "_pos", "_end", "_value", "_range", "_shift",
                 "zero_feeds")

    def __init__(self, data: bytes, pos: int = 0, end: int | None = None):
        self._d = data
        self._pos = pos
        self._end = len(data) if end is None else min(end, len(data))
        self.zero_feeds = 0
        self._value = (self._next() << 8) | self._next()
        self._range = 255
        self._shift = 0

    def _next(self) -> int:
        if self._pos < self._end:
            b = self._d[self._pos]
            self._pos += 1
            return b
        self.zero_feeds += 1
        return 0

    def unconsumed(self) -> int:
        return self._end - self._pos

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self._range - 1) * prob) >> 8)
        big = split << 8
        if self._value >= big:
            bit = 1
            self._range -= split
            self._value -= big
        else:
            bit = 0
            self._range = split
        while self._range < 128:
            self._value <<= 1
            self._range <<= 1
            self._shift += 1
            if self._shift == 8:
                self._shift = 0
                self._value |= self._next()
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.read_bool(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    """RFC 6386 §7.3 boolean encoder (32-bit bottom window, carry
    propagation into already-emitted bytes)."""

    __slots__ = ("_out", "_bottom", "_range", "_count")

    def __init__(self) -> None:
        self._out = bytearray()
        self._bottom = 0
        self._range = 255
        self._count = 24

    def _carry(self) -> None:
        i = len(self._out) - 1
        while i >= 0 and self._out[i] == 0xFF:
            self._out[i] = 0
            i -= 1
        if i >= 0:
            self._out[i] += 1
        else:  # cannot occur for a well-formed stream; keep it safe
            self._out.insert(0, 1)

    def _shift_once(self) -> None:
        if self._bottom & (1 << 31):
            self._carry()
        self._bottom = (self._bottom << 1) & 0xFFFFFFFF
        self._count -= 1
        if self._count == 0:
            self._out.append((self._bottom >> 24) & 0xFF)
            self._bottom &= (1 << 24) - 1
            self._count = 8

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self._range - 1) * prob) >> 8)
        if bit:
            self._bottom += split
            if self._bottom > 0xFFFFFFFF:  # immediate carry out of window
                self._carry()
                self._bottom &= 0xFFFFFFFF
            self._range -= split
        else:
            self._range = split
        while self._range < 128:
            self._range <<= 1
            self._shift_once()

    def literal(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1, 128)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def tree(self, tree: tuple, probs, paths: dict, value: int) -> None:
        for node, bit in paths[value]:
            self.put(bit, probs[node >> 1])

    def finish(self) -> bytes:
        for _ in range(32):
            self._shift_once()
        return bytes(self._out)


def _tree_paths(tree: tuple) -> dict:
    """leaf value -> ((node_index, bit), ...) by DFS."""
    paths: dict = {}

    def walk(i: int, acc: tuple) -> None:
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt <= 0:
                paths[-nxt] = acc + ((i, bit),)
            else:
                walk(nxt, acc + ((i, bit),))

    walk(0, ())
    return paths


KF_YMODE_PATHS = _tree_paths(KF_YMODE_TREE)
UVMODE_PATHS = _tree_paths(UVMODE_TREE)
COEF_PATHS = _tree_paths(COEF_TREE)
# Token-tree paths when the EOB branch is skipped (previous token was
# ZERO): same tree entered at node 2.
COEF_PATHS_NO_EOB = {}
for _v, _p in COEF_PATHS.items():
    if _v != EOB_T:
        COEF_PATHS_NO_EOB[_v] = _p[1:]


# ------------------------------------------------------- transforms


def _idct4x4(block: np.ndarray) -> np.ndarray:
    """RFC 6386 §14.3 integer inverse DCT (20091/35468 multipliers,
    (x+4)>>3 final rounding).  Exact integer arithmetic — Python ints
    via .tolist() so the >>16 truncations match C arithmetic shifts."""
    c1, c2 = 20091, 35468
    ip = [int(v) for v in block.reshape(16)]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * c2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * c1) >> 16)
        cc = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * c1) >> 16)
        t2 = (ip[12 + i] * c2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + cc
        tmp[8 + i] = b1 - cc
    out = [0] * 16
    for i in range(4):
        o = 4 * i
        a1 = tmp[o] + tmp[o + 2]
        b1 = tmp[o] - tmp[o + 2]
        t1 = (tmp[o + 1] * c2) >> 16
        t2 = tmp[o + 3] + ((tmp[o + 3] * c1) >> 16)
        cc = t1 - t2
        t1 = tmp[o + 1] + ((tmp[o + 1] * c1) >> 16)
        t2 = (tmp[o + 3] * c2) >> 16
        d1 = t1 + t2
        out[o] = (a1 + d1 + 4) >> 3
        out[o + 3] = (a1 - d1 + 4) >> 3
        out[o + 1] = (b1 + cc + 4) >> 3
        out[o + 2] = (b1 - cc + 4) >> 3
    return np.array(out, dtype=np.int64).reshape(4, 4)


def _iwht4x4(block: np.ndarray) -> np.ndarray:
    """RFC 6386 §14.3 integer inverse Walsh-Hadamard (the Y2
    second-order transform), (x+3)>>3 final rounding."""
    ip = [int(v) for v in block.reshape(16)]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        o = 4 * i
        a1 = tmp[o] + tmp[o + 3]
        b1 = tmp[o + 1] + tmp[o + 2]
        c1 = tmp[o + 1] - tmp[o + 2]
        d1 = tmp[o] - tmp[o + 3]
        out[o] = (a1 + b1 + 3) >> 3
        out[o + 1] = (c1 + d1 + 3) >> 3
        out[o + 2] = (a1 - b1 + 3) >> 3
        out[o + 3] = (d1 - c1 + 3) >> 3
    return np.array(out, dtype=np.int64).reshape(4, 4)


def _linear_matrix(inverse) -> np.ndarray:
    """16x16 float matrix of an integer inverse transform's LINEAR
    part, derived by feeding scaled unit vectors (scale 2^12 amortizes
    the >>16 truncation and final rounding to < 1e-3 relative)."""
    mat = np.empty((16, 16), dtype=np.float64)
    s = 1 << 12
    for k in range(16):
        e = np.zeros(16, dtype=np.int64)
        e[k] = s
        mat[:, k] = inverse(e.reshape(4, 4)).reshape(16) / s
    return mat


# Forward transforms = exact float inverses of the integer inverse
# transforms' linear maps (then rounded).  This guarantees the
# encode->quantize->dequantize->inverse loop approximates the residual
# as tightly as the quantizer allows, with no separately-recalled
# forward constants to drift.
_FDCT_MAT = np.linalg.inv(_linear_matrix(_idct4x4))
_FWHT_MAT = np.linalg.inv(_linear_matrix(_iwht4x4))


def _fdct4x4(res: np.ndarray) -> np.ndarray:
    return np.rint(_FDCT_MAT @ res.astype(np.float64).reshape(16)
                   ).astype(np.int64)


def _fwht4x4(dcs: np.ndarray) -> np.ndarray:
    return np.rint(_FWHT_MAT @ dcs.astype(np.float64).reshape(16)
                   ).astype(np.int64)


# ------------------------------------------------------- prediction


def _predict(recon: np.ndarray, x: int, y: int, size: int,
             mode: int) -> np.ndarray:
    """Whole-block intra prediction (16x16 luma / 8x8 chroma) from the
    reconstructed plane.  Virtual borders: above=127, left=129,
    top-left 127 on the top row / 129 on the left column (the
    libvpx-documented defaults; encoder and decoder share this
    function, so the convention is pinned by the roundtrip)."""
    if y > 0:
        above = recon[y - 1, x:x + size].astype(np.int64)
    else:
        above = np.full(size, 127, dtype=np.int64)
    if x > 0:
        left = recon[y:y + size, x - 1].astype(np.int64)
    else:
        left = np.full(size, 129, dtype=np.int64)
    if mode == DC_PRED:
        if y > 0 and x > 0:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                size.bit_length())  # log2(2*size) = bit_length(size)
        elif y > 0:
            dc = (int(above.sum()) + size // 2) >> (size.bit_length() - 1)
        elif x > 0:
            dc = (int(left.sum()) + size // 2) >> (size.bit_length() - 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left.reshape(size, 1), (1, size))
    # TM_PRED
    if y > 0 and x > 0:
        p = int(recon[y - 1, x - 1])
    elif y > 0:
        p = 129
    elif x > 0:
        p = 127
    else:
        p = 127
    pred = left.reshape(size, 1) + above.reshape(1, size) - p
    return np.clip(pred, 0, 255)


# --------------------------------------------------- token (de)coding


def _decode_block_tokens(bd: _BoolDecoder, probs: np.ndarray, plane: int,
                         first: int, ctx: int) -> tuple[np.ndarray, int]:
    """Decode one 4x4 block's coefficient LEVELS (natural order, no
    dequant), returning (levels[16], nonzero_flag)."""
    levels = np.zeros(16, dtype=np.int64)
    i = first
    start = 0  # tree entry node; 2 after a ZERO token (no EOB branch)
    nz = 0
    while i < 16:
        p = probs[plane, COEF_BANDS[i], ctx]
        tok = bd.tree(COEF_TREE, p, start)
        if tok == EOB_T:
            break
        if tok == ZERO_T:
            start = 2
            ctx = 0
            i += 1
            continue
        start = 0
        if tok <= FOUR_T:
            val = tok  # ONE..FOUR tokens carry their value
        else:
            val = CAT_BASE[tok]
            extra = 0
            for cp in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.read_bool(cp)
            val += extra
        if bd.read_bool(128):
            val = -val
        levels[ZIGZAG[i]] = val
        nz = 1
        ctx = 1 if abs(val) == 1 else 2
        i += 1
    return levels, nz


def _encode_block_tokens(be: _BoolEncoder, probs: np.ndarray, plane: int,
                         first: int, ctx: int, levels: np.ndarray) -> int:
    """Mirror of :func:`_decode_block_tokens` — emits tokens for the
    zigzag-scanned ``levels`` and returns the nonzero flag."""
    zz = [int(levels[ZIGZAG[i]]) for i in range(16)]
    eob = 16
    while eob > first and zz[eob - 1] == 0:
        eob -= 1
    i = first
    start_paths = COEF_PATHS
    nz = 0
    while i < eob:
        p = probs[plane, COEF_BANDS[i], ctx]
        v = zz[i]
        a = abs(v)
        if a == 0:
            tok = ZERO_T
        elif a <= 4:
            tok = a  # ONE_T..FOUR_T
        elif a <= 6:
            tok = CAT1
        elif a <= 10:
            tok = CAT2
        elif a <= 18:
            tok = CAT3
        elif a <= 34:
            tok = CAT4
        elif a <= 66:
            tok = CAT5
        else:
            tok = CAT6
        for node, bit in start_paths[tok]:
            be.put(bit, p[node >> 1])
        if tok == ZERO_T:
            start_paths = COEF_PATHS_NO_EOB
            ctx = 0
            i += 1
            continue
        start_paths = COEF_PATHS
        if tok >= CAT1:
            extra = a - CAT_BASE[tok]
            cps = CAT_PROBS[tok]
            for k, cp in enumerate(cps):
                be.put((extra >> (len(cps) - 1 - k)) & 1, cp)
        be.put(1 if v < 0 else 0, 128)
        nz = 1
        ctx = 1 if a == 1 else 2
        i += 1
    if eob < 16:
        p = probs[plane, COEF_BANDS[eob], ctx]
        for node, bit in start_paths[EOB_T]:
            be.put(bit, p[node >> 1])
    return nz


# ----------------------------------------------------------- decoder


def _parse_container(content: bytes) -> bytes:
    """Unwrap 'RIFF....WEBPVP8 ' -> the VP8 frame payload."""
    buf = bytes(content)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a RIFF WebP container")
    if buf[12:16] != b"VP8 ":
        raise ValueError("not a lossy (VP8) WebP chunk")
    if len(buf) < 20:
        raise ValueError("truncated WebP container")
    (clen,) = struct.unpack("<I", buf[16:20])
    frame = buf[20:20 + clen]
    if len(frame) < clen:
        raise ValueError("truncated VP8 chunk payload")
    return frame


def decode_vp8_yuv(content: bytes, max_pixels: int | None = None
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a key-frame lossy WebP to (Y, U, V) uint8 planes
    (U/V at half resolution, ceil dims).  Typed ValueError on
    interframes / B_PRED / segmentation / loop-filtered streams and on
    every malformed-input shape; budget-gated before allocation."""
    frame = _parse_container(content)
    if len(frame) < 10:
        raise ValueError("truncated VP8 frame header")
    tag = frame[0] | (frame[1] << 8) | (frame[2] << 16)
    if tag & 1:
        raise ValueError(
            "interframe VP8 (non-key frame) unsupported: this decoder "
            "implements the RFC 6386 key-frame intra path only")
    first_part_size = tag >> 5
    if frame[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe sync code")
    (wraw,) = struct.unpack("<H", frame[6:8])
    (hraw,) = struct.unpack("<H", frame[8:10])
    w, h = wraw & 0x3FFF, hraw & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero VP8 frame dimension")
    check_pixels("VP8", w, h, len(content), max_pixels)
    if 10 + first_part_size > len(frame):
        raise ValueError("VP8 first partition overruns the frame")

    bd = _BoolDecoder(frame, 10, 10 + first_part_size)
    bd.read_bool(128)  # color_space
    bd.read_bool(128)  # clamping_type
    if bd.read_bool(128):
        raise ValueError("segmentation-enabled VP8 streams unsupported "
                         "(documented seam)")
    bd.read_bool(128)  # filter_type
    filter_level = bd.literal(6)
    bd.literal(3)  # sharpness
    if bd.read_bool(128):  # loop-filter adjustments
        if bd.read_bool(128):  # delta update flags
            for _ in range(8):
                if bd.read_bool(128):
                    bd.signed_literal(6)
    if filter_level != 0:
        raise ValueError(
            "loop-filtered VP8 stream (filter_level > 0) unsupported: "
            "decoding without the loop filter would silently "
            "mis-reconstruct (documented seam)")
    n_parts = 1 << bd.literal(2)
    y_ac_qi = bd.literal(7)
    deltas = []
    for _ in range(5):
        deltas.append(bd.signed_literal(4) if bd.read_bool(128) else 0)
    q = _quantizers(y_ac_qi, *deltas)
    bd.read_bool(128)  # refresh_entropy_probs (keyframe: state unused)
    probs = DEFAULT_COEFF_PROBS.copy()
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    if bd.read_bool(COEF_UPDATE_PROB):
                        probs[t, b, c, n] = bd.literal(8)
    skip_enabled = bd.read_bool(128)
    prob_skip = bd.literal(8) if skip_enabled else 0

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    # Token partitions: (n-1) 3-byte sizes after partition 1, then data.
    part_base = 10 + first_part_size
    sizes_end = part_base + 3 * (n_parts - 1)
    if sizes_end > len(frame):
        raise ValueError("VP8 token partition size table truncated")
    bounds = []
    off = sizes_end
    for i in range(n_parts):
        if i < n_parts - 1:
            sz = (frame[part_base + 3 * i]
                  | (frame[part_base + 3 * i + 1] << 8)
                  | (frame[part_base + 3 * i + 2] << 16))
        else:
            sz = len(frame) - off
        if sz < 0 or off + sz > len(frame):
            raise ValueError("VP8 token partition overruns the frame")
        bounds.append((off, off + sz))
        off += sz
    tds = [_BoolDecoder(frame, a, b) for a, b in bounds]

    # Mode decode happens interleaved with residuals in one MB pass
    # (keyframe modes live in partition 1, tokens in the row's token
    # partition — state below mirrors the encoder exactly).
    ry = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    ru = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    rv = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    above = _nz_new(mb_w)
    for my in range(mb_h):
        left = _nz_new(1)
        td = tds[my % n_parts]
        for mx in range(mb_w):
            skip = bd.read_bool(prob_skip) if skip_enabled else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                raise ValueError("B_PRED (4x4 intra) VP8 macroblocks "
                                 "unsupported (documented seam)")
            uvmode = bd.tree(UVMODE_TREE, KF_UVMODE_PROBS)
            if skip:
                _nz_clear(above, mx)
                _nz_clear(left, 0)
                _recon_mb(ry, ru, rv, mx, my, ymode, uvmode, None, None,
                          None)
                continue
            y2l, y2nz = _decode_block_tokens(
                td, probs, PLANE_Y2, 0,
                above["y2"][mx] + left["y2"][0])
            above["y2"][mx] = left["y2"][0] = y2nz
            dcs = _iwht4x4((y2l * np.where(np.arange(16) == 0,
                                           q["y2dc"], q["y2ac"])
                            ).reshape(4, 4)).reshape(16)
            yres = []
            for j in range(16):
                bx, by = j % 4, j // 4
                lv, nzf = _decode_block_tokens(
                    td, probs, PLANE_Y_NO_DC, 1,
                    above["y"][4 * mx + bx] + left["y"][by])
                above["y"][4 * mx + bx] = left["y"][by] = nzf
                co = lv * q["yac"]
                co[0] = dcs[j]
                yres.append(_idct4x4(co.reshape(4, 4)))
            uvres = {"u": [], "v": []}
            for pl, rpl in (("u", ru), ("v", rv)):
                for j in range(4):
                    bx, by = j % 2, j // 2
                    lv, nzf = _decode_block_tokens(
                        td, probs, PLANE_UV, 0,
                        above[pl][2 * mx + bx] + left[pl][by])
                    above[pl][2 * mx + bx] = left[pl][by] = nzf
                    co = lv * q["uvac"]
                    co[0] = lv[0] * q["uvdc"]
                    uvres[pl].append(_idct4x4(co.reshape(4, 4)))
            _recon_mb(ry, ru, rv, mx, my, ymode, uvmode, yres,
                      uvres["u"], uvres["v"])
    # Foreign-stream detector (round 14 — the §13.5 seam made LOUD):
    # this engine's encoder/decoder shift mirror consumes every
    # partition EXACTLY (0 bytes unconsumed, 0 zero-feeds — pinned by
    # test over the fixture space, including unused 2-byte partitions
    # when n_parts > mb_h).  A stream encoded against the real RFC
    # 6386 §13.5 default coefficient probabilities (libvpx) decodes
    # here with wrong probabilities, so its renorm-byte cadence drifts
    # off the partition boundary with overwhelming probability for any
    # non-trivial token mass.  Refusing on drift turns the former
    # silent mis-decode into the typed seam error; the residual
    # false-accept (a foreign stream landing exactly on every
    # boundary) is sketch-grade and documented in the module header.
    for part in (bd, *tds):
        if part.unconsumed() != 0 or part.zero_feeds != 0:
            raise ValueError(
                "VP8 partition consumption drift "
                f"({part.unconsumed()} bytes unconsumed, "
                f"{part.zero_feeds} reads past the end): stream was "
                "likely encoded against the RFC 6386 §13.5/§13.4 "
                "default coefficient probabilities, which this engine "
                "does not vendor (documented seam: "
                "vp8-default-coeff-probs)")
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return ry[:h, :w], ru[:ch, :cw], rv[:ch, :cw]


def _nz_new(mb_w: int) -> dict:
    return {"y": np.zeros(4 * mb_w, dtype=np.int64),
            "u": np.zeros(2 * mb_w, dtype=np.int64),
            "v": np.zeros(2 * mb_w, dtype=np.int64),
            "y2": np.zeros(mb_w, dtype=np.int64)}


def _nz_clear(ctx: dict, mx: int) -> None:
    ctx["y"][4 * mx:4 * mx + 4] = 0
    ctx["u"][2 * mx:2 * mx + 2] = 0
    ctx["v"][2 * mx:2 * mx + 2] = 0
    ctx["y2"][mx] = 0


def _recon_mb(ry, ru, rv, mx, my, ymode, uvmode, yres, ures, vres):
    """Predict + add residuals + clamp for one macroblock (shared by
    encoder and decoder via identical calls — None residues = skip)."""
    py = _predict(ry, 16 * mx, 16 * my, 16, ymode)
    if yres is not None:
        for j in range(16):
            bx, by = j % 4, j // 4
            py[4 * by:4 * by + 4, 4 * bx:4 * bx + 4] += yres[j]
    ry[16 * my:16 * my + 16, 16 * mx:16 * mx + 16] = np.clip(
        py, 0, 255).astype(np.uint8)
    for plane, res in ((ru, ures), (rv, vres)):
        pp = _predict(plane, 8 * mx, 8 * my, 8, uvmode)
        if res is not None:
            for j in range(4):
                bx, by = j % 2, j // 2
                pp[4 * by:4 * by + 4, 4 * bx:4 * bx + 4] += res[j]
        plane[8 * my:8 * my + 8, 8 * mx:8 * mx + 8] = np.clip(
            pp, 0, 255).astype(np.uint8)


def decode_vp8(content: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode lossy WebP to an RGB uint8 array (BT.601 conversion —
    the jpeg.py convention — with nearest-neighbour chroma upsample)."""
    y, u, v = decode_vp8_yuv(content, max_pixels=max_pixels)
    return _yuv420_to_rgb(y, u, v)


def _yuv420_to_rgb(y: np.ndarray, u: np.ndarray,
                   v: np.ndarray) -> np.ndarray:
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float64)
    cb = uu.astype(np.float64) - 128.0
    cr = vv.astype(np.float64) - 128.0
    rgb = np.stack([yf + 1.402 * cr,
                    yf - 0.344136 * cb - 0.714136 * cr,
                    yf + 1.772 * cb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- encoder


def _quantize(coeffs: np.ndarray, q0: int, q1: int,
              first: int = 0) -> np.ndarray:
    """Levels = trunc-toward-zero coeff/q, clamped to the token
    alphabet's CAT6 maximum (both sides dequantize as level*q)."""
    qs = np.full(16, q1, dtype=np.int64)
    qs[0] = q0
    lv = np.sign(coeffs) * (np.abs(coeffs) // qs)
    if first:
        lv[0] = 0
    return np.clip(lv, -MAX_LEVEL, MAX_LEVEL)


def encode_vp8_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   qi: int = 20,
                   y_modes: np.ndarray | None = None,
                   uv_modes: np.ndarray | None = None,
                   token_partitions: int = 1,
                   return_recon: bool = False):
    """Encode uint8 planes (U/V ceil-half resolution) as a key-frame
    lossy WebP.  Runs the full reconstruction loop (predict from RECON
    neighbours, forward transform, quantize, dequantize, integer
    inverse, clamp) so its reconstruction is bit-identical to what
    :func:`decode_vp8_yuv` produces — pytest pins that equality and
    the vp8_roundtrip_stats gate row executes it per document.

    ``y_modes`` / ``uv_modes`` (mb_h x mb_w int arrays, DC/V/H/TM)
    force per-MB prediction modes; default picks per-MB by SAD against
    the prediction.  ``token_partitions`` in {1,2,4,8}."""
    y = np.asarray(y, dtype=np.uint8)
    u = np.asarray(u, dtype=np.uint8)
    v = np.asarray(v, dtype=np.uint8)
    h, w = y.shape
    if not (0 < w < (1 << 14) and 0 < h < (1 << 14)):
        raise ValueError(f"VP8 cannot represent {w}x{h}")
    ch, cw = (h + 1) // 2, (w + 1) // 2
    if u.shape != (ch, cw) or v.shape != (ch, cw):
        raise ValueError("U/V planes must be ceil-half the Y dims")
    if token_partitions not in (1, 2, 4, 8):
        raise ValueError("token_partitions must be 1, 2, 4 or 8")
    qi = int(qi)
    if not 0 <= qi <= 127:
        raise ValueError("qi out of [0, 127]")
    q = _quantizers(qi, 0, 0, 0, 0, 0)

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    # Edge-replicate pad to whole macroblocks (decoder crops).
    ypad = np.pad(y, ((0, mb_h * 16 - h), (0, mb_w * 16 - w)), "edge")
    upad = np.pad(u, ((0, mb_h * 8 - ch), (0, mb_w * 8 - cw)), "edge")
    vpad = np.pad(v, ((0, mb_h * 8 - ch), (0, mb_w * 8 - cw)), "edge")

    ry = np.zeros_like(ypad)
    ru = np.zeros_like(upad)
    rv = np.zeros_like(vpad)

    hdr = _BoolEncoder()
    hdr.put(0, 128)  # color_space
    hdr.put(0, 128)  # clamping_type
    hdr.put(0, 128)  # segmentation_enabled
    hdr.put(0, 128)  # filter_type
    hdr.literal(0, 6)  # loop_filter_level = 0 (no filter applied)
    hdr.literal(0, 3)  # sharpness
    hdr.put(0, 128)  # no lf adjustments
    hdr.literal(token_partitions.bit_length() - 1, 2)
    hdr.literal(qi, 7)
    for _ in range(5):
        hdr.put(0, 128)  # no quantizer deltas
    hdr.put(0, 128)  # refresh_entropy_probs
    for _ in range(4 * 8 * 3 * 11):
        hdr.put(0, COEF_UPDATE_PROB)  # keep default coefficient probs
    hdr.put(1, 128)  # mb_no_coeff_skip enabled
    prob_skip = 128
    hdr.literal(prob_skip, 8)

    probs = DEFAULT_COEFF_PROBS
    tes = [_BoolEncoder() for _ in range(token_partitions)]
    above = _nz_new(mb_w)
    for my in range(mb_h):
        left = _nz_new(1)
        te = tes[my % token_partitions]
        for mx in range(mb_w):
            src_y = ypad[16 * my:16 * my + 16,
                         16 * mx:16 * mx + 16].astype(np.int64)
            src_u = upad[8 * my:8 * my + 8,
                         8 * mx:8 * mx + 8].astype(np.int64)
            src_v = vpad[8 * my:8 * my + 8,
                         8 * mx:8 * mx + 8].astype(np.int64)
            if y_modes is not None:
                ymode = int(y_modes[my, mx])
            else:
                ymode = min(
                    (DC_PRED, V_PRED, H_PRED, TM_PRED),
                    key=lambda m: int(np.abs(
                        src_y - _predict(ry, 16 * mx, 16 * my, 16, m)
                    ).sum()))
            if uv_modes is not None:
                uvmode = int(uv_modes[my, mx])
            else:
                uvmode = min(
                    (DC_PRED, V_PRED, H_PRED, TM_PRED),
                    key=lambda m: int(
                        np.abs(src_u - _predict(ru, 8 * mx, 8 * my, 8, m)
                               ).sum()
                        + np.abs(src_v - _predict(rv, 8 * mx, 8 * my, 8, m)
                                 ).sum()))
            if ymode == B_PRED or ymode not in (0, 1, 2, 3) \
                    or uvmode not in (0, 1, 2, 3):
                raise ValueError("encoder supports DC/V/H/TM modes only")

            pred_y = _predict(ry, 16 * mx, 16 * my, 16, ymode)
            res_y = src_y - pred_y
            ylv, dct_dcs = [], np.zeros(16, dtype=np.int64)
            for j in range(16):
                bx, by = j % 4, j // 4
                co = _fdct4x4(res_y[4 * by:4 * by + 4, 4 * bx:4 * bx + 4])
                dct_dcs[j] = co[0]
                ylv.append(_quantize(co, q["ydc"], q["yac"], first=1))
            y2 = _fwht4x4(dct_dcs)
            y2lv = _quantize(y2, q["y2dc"], q["y2ac"])
            pred_u = _predict(ru, 8 * mx, 8 * my, 8, uvmode)
            pred_v = _predict(rv, 8 * mx, 8 * my, 8, uvmode)
            ulv = [_quantize(_fdct4x4(
                (src_u - pred_u)[4 * (j // 2):4 * (j // 2) + 4,
                                 4 * (j % 2):4 * (j % 2) + 4]),
                q["uvdc"], q["uvac"]) for j in range(4)]
            vlv = [_quantize(_fdct4x4(
                (src_v - pred_v)[4 * (j // 2):4 * (j // 2) + 4,
                                 4 * (j % 2):4 * (j % 2) + 4]),
                q["uvdc"], q["uvac"]) for j in range(4)]

            skip = (not y2lv.any() and
                    not any(l.any() for l in ylv) and
                    not any(l.any() for l in ulv) and
                    not any(l.any() for l in vlv))
            hdr.put(1 if skip else 0, prob_skip)
            hdr.tree(KF_YMODE_TREE, KF_YMODE_PROBS, KF_YMODE_PATHS, ymode)
            hdr.tree(UVMODE_TREE, KF_UVMODE_PROBS, UVMODE_PATHS, uvmode)
            if skip:
                _nz_clear(above, mx)
                _nz_clear(left, 0)
                _recon_mb(ry, ru, rv, mx, my, ymode, uvmode, None, None,
                          None)
                continue

            nz = _encode_block_tokens(
                te, probs, PLANE_Y2, 0,
                above["y2"][mx] + left["y2"][0], y2lv)
            above["y2"][mx] = left["y2"][0] = nz
            dcs = _iwht4x4((y2lv * np.where(np.arange(16) == 0,
                                            q["y2dc"], q["y2ac"])
                            ).reshape(4, 4)).reshape(16)
            yres = []
            for j in range(16):
                bx, by = j % 4, j // 4
                nz = _encode_block_tokens(
                    te, probs, PLANE_Y_NO_DC, 1,
                    above["y"][4 * mx + bx] + left["y"][by], ylv[j])
                above["y"][4 * mx + bx] = left["y"][by] = nz
                co = ylv[j] * q["yac"]
                co[0] = dcs[j]
                yres.append(_idct4x4(co.reshape(4, 4)))
            uvres = {"u": [], "v": []}
            for pl, lvs in (("u", ulv), ("v", vlv)):
                for j in range(4):
                    bx, by = j % 2, j // 2
                    nz = _encode_block_tokens(
                        te, probs, PLANE_UV, 0,
                        above[pl][2 * mx + bx] + left[pl][by], lvs[j])
                    above[pl][2 * mx + bx] = left[pl][by] = nz
                    co = lvs[j] * q["uvac"]
                    co[0] = lvs[j][0] * q["uvdc"]
                    uvres[pl].append(_idct4x4(co.reshape(4, 4)))
            _recon_mb(ry, ru, rv, mx, my, ymode, uvmode, yres,
                      uvres["u"], uvres["v"])

    part1 = hdr.finish()
    parts = [te.finish() for te in tes]
    if len(part1) >= 1 << 19:
        raise ValueError(
            f"first partition {len(part1)} bytes overflows the frame "
            "tag's 19-bit size field — split the frame before encoding")
    for p in parts[:-1]:
        if len(p) >= 1 << 24:
            raise ValueError(
                f"token partition {len(p)} bytes overflows its 24-bit "
                "size field — raise token_partitions")
    tag = (0  # keyframe
           | (0 << 1)  # version
           | (1 << 4)  # show_frame
           | (len(part1) << 5))
    frame = bytearray()
    frame += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    frame += b"\x9d\x01\x2a"
    frame += struct.pack("<HH", w, h)
    frame += part1
    for p in parts[:-1]:
        frame += bytes((len(p) & 0xFF, (len(p) >> 8) & 0xFF,
                        (len(p) >> 16) & 0xFF))
    for p in parts:
        frame += p
    out = _riff_wrap_vp8(bytes(frame))
    if return_recon:
        return out, (ry[:h, :w].copy(), ru[:ch, :cw].copy(),
                     rv[:ch, :cw].copy())
    return out


def _riff_wrap_vp8(frame: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """BT.601 RGB -> YUV with 2x2-mean chroma subsampling (odd dims
    edge-replicate before averaging)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    yf = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = yf.shape
    ph, pw = h + (h % 2), w + (w % 2)

    def sub(p: np.ndarray) -> np.ndarray:
        p = np.pad(p, ((0, ph - h), (0, pw - w)), "edge")
        q = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
             + p[1::2, 1::2]) / 4.0
        return np.clip(np.rint(q), 0, 255).astype(np.uint8)

    return (np.clip(np.rint(yf), 0, 255).astype(np.uint8), sub(cb),
            sub(cr))


def encode_vp8(rgb: np.ndarray, qi: int = 20, **kw) -> bytes:
    """RGB (HxWx3 uint8) -> lossy WebP bytes (kwargs forwarded to
    :func:`encode_vp8_yuv`)."""
    y, u, v = _rgb_to_yuv420(np.asarray(rgb, dtype=np.uint8))
    return encode_vp8_yuv(y, u, v, qi=qi, **kw)
