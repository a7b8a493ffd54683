"""VP8L (lossless WebP) pixel codec: a general decoder (simple AND
normal code-length-coded prefix trees, the max-symbol cap, repeat
codes 16/17/18, LZ77 backward references with direct distances, the
color cache, all four spatial transforms, the entropy image), plus
fixture encoders that synthesize spec-shaped streams for each decode
path — transform-free literals (:func:`encode_vp8l`), predictor
(:func:`encode_vp8l_predicted`), color-indexing
(:func:`encode_vp8l_indexed`), and per-tile prefix groups
(:func:`encode_vp8l_grouped`) — the encode_mp3_frames /
flac_roundtrip posture: headers and entropy coding are real, the
corpus never depends on external codec libraries.

This CLOSES the documented WebP seam (multimodal.py previously walked
only the VP8L header): pixel decode now executes for ALL FOUR spatial
transforms — subtract-green, predictor (all 14 modes, border rules,
the rightmost-column TR wrap), color (staged int8 ``(t*c)>>5``
cross-channel deltas), color-indexing (delta-coded palette including
<= 16-color pixel bundling) — for the entropy image (per-tile meta
prefix groups over a shared color cache), and (round 13) for the 2D
NEAR-DISTANCE map: LZ77 distance prefix values 1..120 resolve through
the vendored 120-entry (dx, dy) spec table (:data:`VP8L_DIST_MAP`,
``dist = dx + dy*width`` clamped up to 1), values > 120 are direct
distances.  The table is pinned two independent ways in tests: it is
re-derivable from the spec's ordering rule (all offsets in the 8-row
window sorted by squared distance / larger dy / +dx first) and spot
anchor codes are asserted against the spec's plane-code LUT
nibble layout.  :func:`encode_vp8l_lz77` is the fixture writer whose
backward references use ONLY near-distance codes.

Robustness: :func:`decode_vp8l` enforces a PIXEL BUDGET before any
allocation or per-pixel loop — 28 attacker-controlled header bits
(14-bit w/h) must not drive an unbounded pure-Python decode on the
untrusted ``decode_image`` path (a ~13-byte crafted header declaring
16384x16384 with zero-bit trees would otherwise cost ~2^28 loop
iterations and a 1 GiB buffer per document).  The budget ties declared
pixels to payload size (``VP8L_PIXELS_PER_BYTE`` — set at the LZ77
maximum copy length, far beyond any real encoder's density) under an
absolute cap ``VP8L_MAX_PIXELS``; a denser stream is rejected with the
typed ValueError family even when its header is formally valid.
Bit packing follows the spec's deflate-style convention (LSB-first
bytes, prefix-code bits packed most-significant-first); the
encode->decode pair is self-consistent and the tests pin exact bit
layouts, but cross-validation against libwebp-encoded files remains
out of scope for this container.

Format facts used (public "WebP Lossless Bitstream Specification"):
signature 0x2F; 14-bit w-1 / 14-bit h-1 / alpha hint / 3-bit version;
per-group trees [green+len+cache(256+24+cache), red(256), blue(256),
alpha(256), distance(40)]; code-length-code order
[17,18,0,1,2,3,4,5,16,6,7,8,9,10,11,12,13,14,15]; LZ77 prefix value
``code<4 ? code+1 : ((2+(code&1))<<eb) + bits(eb) + 1`` with
``eb=(code-2)>>1``; color-cache hash ``(0x1e35a7bd*argb) >>
(32-bits)``.
"""

from __future__ import annotations

import numpy as np

CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
_HASH_MUL = 0x1E35A7BD

# The 2D near-distance map (WebP Lossless Bitstream Specification /
# RFC 9649 §"Decoding of Distances"): LZ77 distance prefix VALUES
# 1..120 name a (dx, dy) pixel offset in the 8-row neighborhood
# window; dist = dx + dy*width, clamped up to 1.  Values > 120 are
# direct distances (value - 120).  The published table is exactly the
# 120 offsets {y in 0..7, x in -7..8, y=0 => x >= 1} ordered by
# squared euclidean distance, then larger dy first, then +dx before
# -dx — test_vp8l.py re-derives it from that rule and pins spec
# anchor codes, so a typo here cannot survive.
VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _LsbReader:
    """LSB-first bit reader (the VP8L convention)."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0          # bit position

    def bits(self, n: int) -> int:
        v = 0
        for k in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self._d[byte] >> (self._pos & 7)) & 1) << k
            self._pos += 1
        return v


class _LsbWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._bit = 0

    def bits(self, v: int, n: int) -> None:
        for k in range(n):
            if self._bit == 0:
                self._bytes.append(0)
            if (v >> k) & 1:
                self._bytes[-1] |= 1 << self._bit
            self._bit = (self._bit + 1) & 7

    def code(self, c: int, length: int) -> None:
        """Prefix-code bits pack most-significant-first (deflate style)."""
        for k in range(length - 1, -1, -1):
            self.bits((c >> k) & 1, 1)

    def payload(self) -> bytes:
        return bytes(self._bytes)


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment: increasing code
    values in (length, symbol) order; zero-length symbols absent."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted((s for s, ln in lengths.items() if ln > 0),
                      key=lambda s: (lengths[s], s)):
        code <<= lengths[sym] - prev_len
        out[sym] = (code, lengths[sym])
        code += 1
        prev_len = lengths[sym]
    return out


class _Tree:
    """Decodable prefix tree: single-symbol trees read zero bits."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nonzero = [s for s, ln in lengths.items() if ln > 0]
        if not nonzero:
            raise ValueError("VP8L prefix tree with no symbols")
        if len(nonzero) == 1:
            self._only: int | None = nonzero[0]
            self._lut: dict[tuple[int, int], int] = {}
            return
        self._only = None
        self._lut = {cl: s for s, cl in _canonical(lengths).items()}
        # completeness (Kraft equality) — an over/under-subscribed code
        # is a malformed stream, not a decoder loop
        if sum(2 ** -ln for s, ln in lengths.items() if ln > 0) != 1.0:
            raise ValueError("incomplete VP8L prefix code")

    def read(self, r: _LsbReader) -> int:
        if self._only is not None:
            return self._only
        code, length = 0, 0
        while True:
            code = (code << 1) | r.bits(1)
            length += 1
            if (code, length) in self._lut:
                return self._lut[(code, length)]
            if length > 15:
                raise ValueError("VP8L prefix walk exceeded 15 bits")


def _read_tree(r: _LsbReader, alphabet: int) -> _Tree:
    if r.bits(1):                                 # simple code
        num_symbols = r.bits(1) + 1
        first_8bits = r.bits(1)
        s0 = r.bits(8 if first_8bits else 1)
        if num_symbols == 1:
            return _Tree({s0: 1})                 # becomes zero-bit
        s1 = r.bits(8)
        if s0 == s1:
            raise ValueError("simple VP8L code repeats a symbol")
        return _Tree({s0: 1, s1: 1})
    num_codes = 4 + r.bits(4)
    clc_lengths = {CLC_ORDER[i]: r.bits(3) for i in range(num_codes)}
    clc = _Tree(clc_lengths)
    if r.bits(1):                                 # max-symbol cap
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    prev_len = 8
    symbol = 0
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = clc.read(r)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + r.bits(3)
        else:                                     # 18
            symbol += 11 + r.bits(7)
    return _Tree(lengths)


def _lz77_value(code: int, r: _LsbReader) -> int:
    if code < 4:
        return code + 1
    eb = (code - 2) >> 1
    return ((2 + (code & 1)) << eb) + r.bits(eb) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`_lz77_value`: the (prefix code, extra-bits
    value, extra-bit count) that encodes ``value`` — derived from the
    spec formula, round-trip-pinned in tests over the whole range."""
    if value < 1:
        raise ValueError("LZ77 prefix values start at 1")
    if value <= 4:
        return value - 1, 0, 0
    t = value - 1
    eb = t.bit_length() - 2
    parity = (t >> eb) & 1
    return 2 * eb + 2 + parity, t - ((2 + parity) << eb), eb


# decompression-bomb guard (round 12): ONE policy rendering lives in
# functions/_budget.py (shared with decode_image and decode_gif); the
# VP8L_* names stay as aliases for existing importers.
from ._budget import (DECODE_MAX_PIXELS as VP8L_MAX_PIXELS,
                      DECODE_PIXELS_PER_BYTE as VP8L_PIXELS_PER_BYTE,
                      check_pixels as _check_pixels)


def _read_cache_bits(r: _LsbReader) -> int:
    if not r.bits(1):
        return 0
    cache_bits = r.bits(4)
    if not 1 <= cache_bits <= 11:
        raise ValueError("invalid VP8L color-cache size")
    return cache_bits


def _decode_pixel_stream(r: _LsbReader, w: int, h: int, cache_bits: int,
                         groups: tuple | None = None) -> np.ndarray:
    """Prefix-code group(s) + the LZ77/color-cache pixel loop: w*h
    uint32 ARGB values in scan order.  Shared by the main image and
    entropy-coded transform sub-images.  ``groups`` carries the
    decoded entropy image as ``(prefix_bits, meta_idx)`` — each pixel
    then selects its tile's prefix-code group; the color cache stays
    GLOBAL across groups (spec §5)."""
    n_pixels = w * h
    cache_size = (1 << cache_bits) if cache_bits else 0

    def read_group() -> tuple:
        return (_read_tree(r, 256 + 24 + cache_size),
                _read_tree(r, 256), _read_tree(r, 256),
                _read_tree(r, 256), _read_tree(r, 40))

    if groups is None:
        pb, meta_idx = 0, None
        table = [read_group()]
    else:
        pb, meta_idx = groups
        table = [read_group()
                 for _ in range(int(meta_idx.max()) + 1)]
    cache = [0] * cache_size
    out = np.zeros(n_pixels, dtype=np.uint32)
    pos = 0

    def emit(argb: int) -> None:
        nonlocal pos
        out[pos] = argb
        pos += 1
        if cache_size:
            cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] \
                = argb

    while pos < n_pixels:
        if meta_idx is None:
            green, red, blue, alpha, dist_tree = table[0]
        else:
            y, x = divmod(pos, w)
            green, red, blue, alpha, dist_tree = \
                table[int(meta_idx[y >> pb, x >> pb])]
        s = green.read(r)
        if s < 256:
            rr = red.read(r)
            b = blue.read(r)
            a = alpha.read(r)
            emit((a << 24) | (rr << 16) | (s << 8) | b)
        elif s < 256 + 24:
            length = _lz77_value(s - 256, r)
            dcode = _lz77_value(dist_tree.read(r), r)
            if dcode <= 120:
                # vendored spec table (round 13 — the last VP8L seam):
                # a 2D offset in the 8-row window, clamped up to 1
                dx, dy = VP8L_DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                if pos >= n_pixels:
                    raise ValueError("VP8L backward reference overruns")
                emit(int(out[pos - dist]))
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            emit(cache[idx])
    return out


def _decode_entropy_coded(r: _LsbReader, w: int, h: int) -> np.ndarray:
    """Entropy-coded image (spec: ``<color cache info><data>`` — no
    transforms, no meta-prefix bit): the encoding of transform data
    such as the predictor mode sub-image.  Returns (h, w) uint32."""
    cache_bits = _read_cache_bits(r)
    return _decode_pixel_stream(r, w, h, cache_bits).reshape(h, w)


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _div2_trunc(v: int) -> int:
    """C-style truncating division by 2 (Python // floors negatives)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _predict(mode: int, left: tuple, top: tuple, tl: tuple,
             tr: tuple) -> tuple:
    """One predicted ARGB pixel as an (a, r, g, b) channel tuple.
    Modes per the public VP8L spec §4.2 (predictor transform)."""
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return tuple(_avg2(_avg2(le, t2), t)
                     for le, t2, t in zip(left, tr, top))
    if mode == 6:
        return tuple(_avg2(le, c) for le, c in zip(left, tl))
    if mode == 7:
        return tuple(_avg2(le, t) for le, t in zip(left, top))
    if mode == 8:
        return tuple(_avg2(c, t) for c, t in zip(tl, top))
    if mode == 9:
        return tuple(_avg2(t, t2) for t, t2 in zip(top, tr))
    if mode == 10:
        return tuple(_avg2(_avg2(le, c), _avg2(t, t2))
                     for le, c, t, t2 in zip(left, tl, top, tr))
    if mode == 11:
        # Select: Manhattan distance of each candidate to L+T-TL
        p_l = sum(abs(t - c) for t, c in zip(top, tl))
        p_t = sum(abs(le - c) for le, c in zip(left, tl))
        return left if p_l < p_t else top
    if mode == 12:
        return tuple(_clamp255(le + t - c)
                     for le, t, c in zip(left, top, tl))
    if mode == 13:
        return tuple(
            _clamp255(_avg2(le, t) + _div2_trunc(_avg2(le, t) - c))
            for le, t, c in zip(left, top, tl))
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _s8(v: int) -> int:
    """Interpret a byte as int8 (the color-transform convention)."""
    return v - 256 if v >= 128 else v


def _inverse_color_transform(argb: np.ndarray, size_bits: int,
                             cte: np.ndarray) -> np.ndarray:
    """Invert the color transform over a (h, w) uint32 image: per the
    public spec §4.3, each tile's ColorTransformElement carries three
    int8 factors — green_to_red in the BLUE channel, green_to_blue in
    the GREEN channel, red_to_blue in the RED channel — and the decoder
    adds ``delta(t, c) = (int8(t) * int8(c)) >> 5`` staged as: red +=
    delta(g2r, green); blue += delta(g2b, green); blue += delta(r2b,
    NEW red) — all channels mod 256."""
    h, w = argb.shape
    out = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            v = int(argb[y, x])
            t = int(cte[y >> size_bits, x >> size_bits])
            g2r = _s8(t & 0xFF)
            g2b = _s8((t >> 8) & 0xFF)
            r2b = _s8((t >> 16) & 0xFF)
            g = _s8((v >> 8) & 0xFF)
            red = ((v >> 16) & 0xFF) + ((g2r * g) >> 5)
            red &= 0xFF
            blue = (v & 0xFF) + ((g2b * g) >> 5)
            blue = (blue + ((r2b * _s8(red)) >> 5)) & 0xFF
            out[y, x] = (v & 0xFF00FF00) | (red << 16) | blue
    return out


def _palette_width_bits(n_colors: int) -> int:
    """Pixel-bundling width: palettes of <= 16 colors pack several
    indices into one green byte (spec §4.4)."""
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(packed: np.ndarray, width_bits: int,
                            palette: np.ndarray, w: int) -> np.ndarray:
    """Invert the color-indexing transform: unbundle the green-channel
    indices ((8 >> width_bits)-bit fields, FIRST pixel in the
    LEAST-significant bits) back to the full width ``w`` and map them
    through the delta-decoded palette; an index past the palette maps
    to transparent black (the spec's out-of-range rule)."""
    h = packed.shape[0]
    out = np.zeros((h, w), dtype=np.uint32)
    n = len(palette)
    if width_bits == 0:
        for y in range(h):
            for x in range(w):
                i = (int(packed[y, x]) >> 8) & 0xFF
                out[y, x] = int(palette[i]) if i < n else 0
        return out
    per = 1 << width_bits
    bits = 8 >> width_bits
    mask = (1 << bits) - 1
    for y in range(h):
        for xp in range(packed.shape[1]):
            g = (int(packed[y, xp]) >> 8) & 0xFF
            for k in range(per):
                x = xp * per + k
                if x >= w:
                    break
                i = (g >> (k * bits)) & mask
                out[y, x] = int(palette[i]) if i < n else 0
    return out


def _delta_decode_palette(raw: np.ndarray) -> np.ndarray:
    """Palette entries are subtraction-coded: entry i adds to entry i-1
    per channel mod 256 (the first entry is stored raw)."""
    pal = np.zeros(raw.shape[0], dtype=np.uint32)
    prev = 0
    for i, v in enumerate(int(x) for x in raw):
        cur = 0
        for shift in (24, 16, 8, 0):
            cur |= ((((prev >> shift) & 0xFF) + ((v >> shift) & 0xFF))
                    & 0xFF) << shift
        pal[i] = cur
        prev = cur
    return pal


def _inverse_predictor(argb: np.ndarray, size_bits: int,
                       modes: np.ndarray) -> np.ndarray:
    """Invert the predictor transform in place over a (h, w) uint32
    residual image: scan order, per-channel mod-256 addition of the
    tile's predicted pixel.  Border rules per the spec: (0,0) is
    predicted BLACK (0xff000000), the rest of the top row L, the left
    column T, and the TR-pixel of the rightmost column wraps to the
    leftmost pixel of the SAME row."""
    h, w = argb.shape
    px = [[(0, 0, 0, 0)] * w for _ in range(h)]

    def chans(v: int) -> tuple:
        return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                v & 0xFF)

    for y in range(h):
        row = px[y]
        prev = px[y - 1]
        for x in range(w):
            if y == 0 and x == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = row[x - 1]
            elif x == 0:
                pred = prev[x]
            else:
                mode_px = int(modes[y >> size_bits, x >> size_bits])
                mode = (mode_px >> 8) & 0xFF
                if mode > 13:
                    raise ValueError(
                        f"invalid VP8L predictor mode {mode}")
                tr = row[0] if x + 1 == w else prev[x + 1]
                pred = _predict(mode, row[x - 1], prev[x],
                                prev[x - 1], tr)
            res = chans(int(argb[y, x]))
            row[x] = tuple((rv + pv) & 0xFF for rv, pv in zip(res, pred))
    out = np.zeros((h, w), dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            a, rr, g, b = px[y][x]
            out[y, x] = (a << 24) | (rr << 16) | (g << 8) | b
    return out


def decode_vp8l(content: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode a VP8L stream (RIFF/WEBP container or a bare VP8L
    payload) to an (h, w, 4) uint8 RGBA array.  All four spatial
    transforms and the entropy image decode; the near-distance map is
    the one remaining typed-error seam (module docstring), and the
    pixel-budget bomb guard rejects crafted headers (``max_pixels``
    overrides the payload-tied default)."""
    buf = bytes(content)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        if buf[12:16] != b"VP8L":
            raise ValueError("not a VP8L (lossless) WebP chunk")
        buf = buf[20:]
    if not buf or buf[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    r = _LsbReader(buf[1:])
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bits(1)                                     # alpha hint
    if r.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    # the bomb guard: BEFORE any transform sub-image read, buffer
    # allocation, or per-pixel loop (ADVICE r11 / VERDICT r11 task 1)
    _check_pixels("VP8L", w, h, len(buf), max_pixels)
    transforms: list[tuple] = []
    cur_w = w                                     # color-indexing packs it
    while r.bits(1):
        ttype = r.bits(2)
        if ttype == 2:                            # subtract-green
            transforms.append(("subtract_green",))
        elif ttype in (0, 1):                     # predictor / color
            size_bits = r.bits(3) + 2
            bw = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            tiles = _decode_entropy_coded(r, bw, bh)
            transforms.append(("predictor" if ttype == 0 else "color",
                               size_bits, tiles))
        else:                                     # 3: color indexing
            n_colors = r.bits(8) + 1
            width_bits = _palette_width_bits(n_colors)
            raw = _decode_entropy_coded(r, n_colors, 1)[0]
            palette = _delta_decode_palette(raw)
            transforms.append(("palette", width_bits, palette, cur_w))
            if width_bits:
                cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits
    cache_bits = _read_cache_bits(r)
    groups = None
    if r.bits(1):                                 # entropy image
        prefix_bits = r.bits(3) + 2
        ew = (cur_w + (1 << prefix_bits) - 1) >> prefix_bits
        eh = (h + (1 << prefix_bits) - 1) >> prefix_bits
        meta = _decode_entropy_coded(r, ew, eh)
        groups = (prefix_bits, (meta >> 8) & 0xFFFF)
    argb = _decode_pixel_stream(r, cur_w, h, cache_bits,
                                groups).reshape(h, cur_w)
    # inverse transforms apply in REVERSE order of their reading
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            g = (argb >> 8) & 0xFF
            rr = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (rr << 16) | b
        elif t[0] == "predictor":
            argb = _inverse_predictor(argb, t[1], t[2])
        elif t[0] == "color":
            argb = _inverse_color_transform(argb, t[1], t[2])
        else:
            argb = _inverse_color_indexing(argb, t[1], t[2], t[3])
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (argb >> 16) & 0xFF
    rgba[..., 1] = (argb >> 8) & 0xFF
    rgba[..., 2] = argb & 0xFF
    rgba[..., 3] = (argb >> 24) & 0xFF
    return rgba


# --- encoder (literal-pixel subset) --------------------------------------------

def _flat_lengths(symbols: list[int]) -> dict[int, int]:
    """Complete (Kraft-exact) code lengths over ``symbols``: with
    k = len(symbols) and L = ceil(log2 k), the first 2^L - k symbols
    get length L-1 and the rest length L."""
    k = len(symbols)
    if k == 1:
        return {symbols[0]: 1}
    length = (k - 1).bit_length()
    n_short = (1 << length) - k
    return {s: (length - 1 if i < n_short else length)
            for i, s in enumerate(sorted(symbols))}


def _write_tree(w: _LsbWriter, lengths: dict[int, int]) -> None:
    """Emit one prefix tree: simple form for <= 2 symbols, else the
    normal code-length-coded form with the max-symbol cap and a flat
    (possibly single-symbol) code-length code."""
    syms = sorted(lengths)
    if len(syms) <= 2 and syms[-1] <= 255:
        # simple codes carry 8-bit symbols only — larger ones (length /
        # color-cache codes in the green alphabet) take the normal form
        w.bits(1, 1)                              # simple
        w.bits(len(syms) - 1, 1)
        w.bits(1, 1)                              # first symbol in 8 bits
        w.bits(syms[0], 8)
        if len(syms) == 2:
            w.bits(syms[1], 8)
        return
    w.bits(0, 1)                                  # normal
    max_sym = syms[-1] + 1
    seq = [lengths.get(i, 0) for i in range(max_sym)]
    clc_lengths = _flat_lengths(sorted(set(seq)))
    num_codes = 1 + max(CLC_ORDER.index(v) for v in clc_lengths)
    if num_codes < 4:
        num_codes = 4
    w.bits(num_codes - 4, 4)
    for i in range(num_codes):
        w.bits(clc_lengths.get(CLC_ORDER[i], 0), 3)
    # max-symbol cap: nbits = 2 + 2v must hold max_sym - 2
    v = 0
    while (max_sym - 2) >> (2 + 2 * v):
        v += 1
    w.bits(1, 1)                                  # use max-symbol cap
    w.bits(v, 3)
    w.bits(max_sym - 2, 2 + 2 * v)
    clc_codes = _canonical(clc_lengths)
    single = len(clc_lengths) == 1
    for v in seq:
        if not single:
            w.code(*clc_codes[v])



def _riff_wrap(w: _LsbWriter) -> bytes:
    """ONE rendering of the RIFF/WEBP container wrap (round-12 review
    fix: previously copied into each of the four encoders)."""
    import struct

    payload = bytes([0x2F]) + w.payload()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_dims_header(w: _LsbWriter, wd: int, h: int,
                       alpha_hint: bool) -> None:
    """ONE rendering of the 14-bit dims / alpha-hint / version
    preamble shared by every encoder."""
    if not (0 < wd <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("VP8L cannot represent these dimensions")
    w.bits(wd - 1, 14)
    w.bits(h - 1, 14)
    w.bits(1 if alpha_hint else 0, 1)
    w.bits(0, 3)                                  # version


def encode_vp8l(rgba: np.ndarray, subtract_green: bool = False) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array as a spec-shaped VP8L
    stream: optional subtract-green transform, no color cache, no LZ77
    — every pixel a literal under per-channel flat prefix codes (simple
    codes when a channel uses <= 2 values, normal code-length-coded
    trees with the max-symbol cap otherwise).  Wrapped in a RIFF/WEBP
    container."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("encode_vp8l expects (h, w, 4) RGBA")
    h, wd = a.shape[:2]
    w = _LsbWriter()
    _write_dims_header(w, wd, h, bool((a[..., 3] != 255).any()))
    if subtract_green:
        a = a.copy()
        a[..., 0] -= a[..., 1]                    # uint8 wraparound = mod 256
        a[..., 2] -= a[..., 1]
        w.bits(1, 1)                              # a transform follows
        w.bits(2, 2)                              # type: subtract-green
    w.bits(0, 1)                                  # end of transforms
    w.bits(0, 1)                                  # no color cache
    w.bits(0, 1)                                  # no entropy image
    chans = {
        "g": sorted({int(v) for v in a[..., 1].flat}),
        "r": sorted({int(v) for v in a[..., 0].flat}),
        "b": sorted({int(v) for v in a[..., 2].flat}),
        "a": sorted({int(v) for v in a[..., 3].flat}),
    }
    lengths = {k: _flat_lengths(v) for k, v in chans.items()}
    for key in ("g", "r", "b", "a"):
        _write_tree(w, lengths[key])
    _write_tree(w, {0: 1})                        # distance: single symbol
    codes = {k: _canonical(v) for k, v in lengths.items()}

    def put(key: str, val: int) -> None:
        if len(chans[key]) > 1:
            w.code(*codes[key][val])

    for y in range(h):
        for x in range(wd):
            # spec literal order: green, red, blue, alpha
            put("g", int(a[y, x, 1]))
            put("r", int(a[y, x, 0]))
            put("b", int(a[y, x, 2]))
            put("a", int(a[y, x, 3]))
    return _riff_wrap(w)


def encode_vp8l_lz77(rgba: np.ndarray, min_match: int = 3) -> bytes:
    """Near-distance LZ77 VP8L fixture encoder (round 13 — the seam
    closer's writer side): greedy LZ77 over the raster pixel stream
    where the candidate distances are EXACTLY the 120 spec plane
    offsets (:data:`VP8L_DIST_MAP`), so every backward reference in
    the stream carries a near-distance code (1..120) and decoding
    exercises the vendored table — never direct distances.  Literals
    ride flat per-channel trees like :func:`encode_vp8l`; overlapping
    copies (dist < length, the run-length idiom) are legal and
    emitted.  RIFF-wrapped."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("encode_vp8l_lz77 expects (h, w, 4) RGBA")
    h, wd = a.shape[:2]
    n = h * wd
    argb = ((a[..., 3].astype(np.uint32) << 24)
            | (a[..., 0].astype(np.uint32) << 16)
            | (a[..., 1].astype(np.uint32) << 8)
            | a[..., 2].astype(np.uint32)).reshape(-1)
    # usable plane codes: positive in-image distances only (clamped
    # codes exist for decoders, not honest encoders)
    dists = [(code, dx + dy * wd)
             for code, (dx, dy) in enumerate(VP8L_DIST_MAP, start=1)
             if dx + dy * wd >= 1]
    max_len = 4096                   # ceiling of the 24-code length alphabet

    tokens: list[tuple] = []         # ("lit", argb) | ("copy", len, pcode)
    pos = 0
    while pos < n:
        best_len, best_code = 0, 0
        for pcode, dist in dists:
            if dist > pos:
                continue
            length = 0
            limit = min(max_len, n - pos)
            while (length < limit
                   and argb[pos + length - dist] == argb[pos + length]):
                length += 1
            if length > best_len:
                best_len, best_code = length, pcode
        if best_len >= min_match:
            tokens.append(("copy", best_len, best_code))
            pos += best_len
        else:
            tokens.append(("lit", int(argb[pos])))
            pos += 1

    g_syms, r_syms, b_syms, a_syms, d_syms = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            g_syms.add((v >> 8) & 0xFF)
            r_syms.add((v >> 16) & 0xFF)
            b_syms.add(v & 0xFF)
            a_syms.add(v >> 24)
        else:
            g_syms.add(256 + _lz77_code(t[1])[0])
            d_syms.add(_lz77_code(t[2])[0])

    w = _LsbWriter()
    _write_dims_header(w, wd, h, bool((a[..., 3] != 255).any()))
    w.bits(0, 1)                                  # no transforms
    w.bits(0, 1)                                  # no color cache
    w.bits(0, 1)                                  # no entropy image
    lengths = {k: _flat_lengths(sorted(s)) for k, s in
               (("g", g_syms), ("r", r_syms or {0}), ("b", b_syms or {0}),
                ("a", a_syms or {0}), ("d", d_syms or {0}))}
    for key in ("g", "r", "b", "a", "d"):
        _write_tree(w, lengths[key])
    codes = {k: _canonical(v) for k, v in lengths.items()}

    def put(key: str, val: int) -> None:
        if len(lengths[key]) > 1:
            w.code(*codes[key][val])

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            put("g", (v >> 8) & 0xFF)
            put("r", (v >> 16) & 0xFF)
            put("b", v & 0xFF)
            put("a", v >> 24)
        else:
            _len, pcode = t[1], t[2]
            lc, lx, leb = _lz77_code(_len)
            put("g", 256 + lc)
            if leb:
                w.bits(lx, leb)
            dc, dx_, deb = _lz77_code(pcode)
            put("d", dc)
            if deb:
                w.bits(dx_, deb)
    return _riff_wrap(w)


def encode_vp8l_indexed(idx: np.ndarray, palette: list[int]) -> bytes:
    """Spec-shaped COLOR-INDEXING VP8L stream (fixture generator,
    round 12): delta-code the palette into an entropy-coded (n, 1)
    sub-image and bundle the (h, w) index grid into the green channel
    at the palette-size width (``_palette_width_bits`` — first pixel
    in the least-significant bits), so the registry row can EXECUTE
    the palette decode path.  RIFF-wrapped like :func:`encode_vp8l`;
    the public encoder stays transform-free."""
    idx = np.asarray(idx)
    h, wd = idx.shape
    n = len(palette)
    if not 1 <= n <= 256:
        raise ValueError("palette must carry 1..256 colors")
    if int(idx.min()) < 0 or int(idx.max()) >= n:
        raise ValueError("index grid addresses past the palette")
    width_bits = _palette_width_bits(n)
    w = _LsbWriter()
    _write_dims_header(
        w, wd, h, any(((p >> 24) & 0xFF) != 255 for p in palette))
    w.bits(1, 1)                                  # a transform follows
    w.bits(3, 2)                                  # type 3: color indexing
    w.bits(n - 1, 8)
    deltas = []
    prev = 0
    for c in palette:
        d = 0
        for shift in (24, 16, 8, 0):
            d |= ((((c >> shift) & 0xFF) - ((prev >> shift) & 0xFF))
                  & 0xFF) << shift
        deltas.append(d)
        prev = c
    w.bits(0, 1)                   # palette sub-image: no color cache
    _write_literal_image(w, np.array([deltas], dtype=np.uint32))
    w.bits(0, 1)                   # end of transforms
    w.bits(0, 1)                   # main image: no color cache
    w.bits(0, 1)                   # no entropy image
    if width_bits == 0:
        packed = (idx.astype(np.uint32)) << 8
    else:
        per = 1 << width_bits
        bits = 8 >> width_bits
        pw = (wd + per - 1) // per
        packed = np.zeros((h, pw), dtype=np.uint32)
        for y in range(h):
            for xp in range(pw):
                g = 0
                for k in range(per):
                    x = xp * per + k
                    if x < wd:
                        g |= int(idx[y, x]) << (k * bits)
                packed[y, xp] = g << 8
    _write_literal_image(w, packed)
    return _riff_wrap(w)


def encode_vp8l_grouped(rgba: np.ndarray, prefix_bits: int = 2) -> bytes:
    """Spec-shaped stream with an ENTROPY IMAGE (fixture generator,
    round 12): one prefix-code group per tile (meta index = row-major
    tile number, stored as (red<<8)|green in the meta sub-image), each
    group's literal trees built over its OWN tile's channel values —
    so the registry row can EXECUTE the meta-prefix-group decode path.
    No transforms, no color cache; RIFF-wrapped like
    :func:`encode_vp8l`, which stays entropy-image-free."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("encode_vp8l_grouped expects (h, w, 4) RGBA")
    h, wd = a.shape[:2]
    if not 2 <= prefix_bits <= 9:
        raise ValueError("prefix_bits must be in 2..9")
    bw = (wd + (1 << prefix_bits) - 1) >> prefix_bits
    bh = (h + (1 << prefix_bits) - 1) >> prefix_bits
    argb = ((a[..., 3].astype(np.uint32) << 24)
            | (a[..., 0].astype(np.uint32) << 16)
            | (a[..., 1].astype(np.uint32) << 8)
            | a[..., 2].astype(np.uint32))
    w = _LsbWriter()
    _write_dims_header(w, wd, h, bool((a[..., 3] != 255).any()))
    w.bits(0, 1)                                  # no transforms
    w.bits(0, 1)                                  # no color cache
    w.bits(1, 1)                                  # entropy image
    w.bits(prefix_bits - 2, 3)
    meta = np.zeros((bh, bw), dtype=np.uint32)
    for ty in range(bh):
        for tx in range(bw):
            g = ty * bw + tx
            meta[ty, tx] = ((g >> 8) << 16) | ((g & 0xFF) << 8)
    w.bits(0, 1)                   # meta sub-image: no color cache
    _write_literal_image(w, meta)
    side = 1 << prefix_bits
    groups = []
    for g in range(bh * bw):
        ty, tx = divmod(g, bw)
        tile = argb[ty * side:min((ty + 1) * side, h),
                    tx * side:min((tx + 1) * side, wd)]
        vals = {
            "g": [(int(v) >> 8) & 0xFF for v in tile.flat],
            "r": [(int(v) >> 16) & 0xFF for v in tile.flat],
            "b": [int(v) & 0xFF for v in tile.flat],
            "a": [(int(v) >> 24) & 0xFF for v in tile.flat],
        }
        lengths = {k: _flat_lengths(sorted(set(v)))
                   for k, v in vals.items()}
        for key in ("g", "r", "b", "a"):
            _write_tree(w, lengths[key])
        _write_tree(w, {0: 1})
        groups.append((lengths,
                       {k: _canonical(v) for k, v in lengths.items()}))
    for y in range(h):             # scan order, per-pixel group codes
        for x in range(wd):
            lengths, codes = groups[(y >> prefix_bits) * bw
                                    + (x >> prefix_bits)]
            v = int(argb[y, x])
            for key, val in (("g", (v >> 8) & 0xFF),
                             ("r", (v >> 16) & 0xFF),
                             ("b", v & 0xFF),
                             ("a", (v >> 24) & 0xFF)):
                if len(lengths[key]) > 1:
                    w.code(*codes[key][val])
    return _riff_wrap(w)


def _write_literal_image(w: _LsbWriter, argb: np.ndarray) -> None:
    """One prefix-code group + every pixel as a literal (g, r, b, a
    order) for an (h, w) uint32 ARGB image — the data body shared by
    the predictor fixture's mode sub-image and residual image."""
    vals = {
        "g": [(int(v) >> 8) & 0xFF for v in argb.flat],
        "r": [(int(v) >> 16) & 0xFF for v in argb.flat],
        "b": [int(v) & 0xFF for v in argb.flat],
        "a": [(int(v) >> 24) & 0xFF for v in argb.flat],
    }
    lengths = {k: _flat_lengths(sorted(set(v))) for k, v in vals.items()}
    for key in ("g", "r", "b", "a"):
        _write_tree(w, lengths[key])
    _write_tree(w, {0: 1})                        # distance: single symbol
    codes = {k: _canonical(v) for k, v in lengths.items()}
    for i in range(argb.size):
        for key in ("g", "r", "b", "a"):
            if len(lengths[key]) > 1:
                w.code(*codes[key][vals[key][i]])


def encode_vp8l_predicted(rgba: np.ndarray, modes: np.ndarray,
                          size_bits: int = 2) -> bytes:
    """Spec-shaped PREDICTOR-transformed VP8L stream — the fixture
    generator that lets the registry row EXECUTE the predictor decode
    path (round 12), the same synthesize-then-parse posture as
    :func:`encode_vp8l` for the transform-free row.  Applies the
    forward transform (residual = pixel - predict(FINAL neighbors),
    the spec's border rules — sharing :func:`_predict` with the
    decoder; the INDEPENDENT forward rendering lives in
    tests/test_vp8l.py), emits the transform signaling, the
    entropy-coded per-tile mode sub-image, and the residuals as
    literal-pixel data.  ``modes`` is the
    (ceil(h/2^size_bits), ceil(w/2^size_bits)) tile-mode grid.  The
    public :func:`encode_vp8l` stays transform-free."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("encode_vp8l_predicted expects (h, w, 4) RGBA")
    h, wd = a.shape[:2]
    if not 2 <= size_bits <= 9:                   # 3-bit field holds -2
        raise ValueError("predictor size_bits must be in 2..9")
    bw = (wd + (1 << size_bits) - 1) >> size_bits
    bh = (h + (1 << size_bits) - 1) >> size_bits
    modes = np.asarray(modes, dtype=np.uint32)
    if modes.shape != (bh, bw) or int(modes.max()) > 13:
        raise ValueError("predictor mode grid must be "
                         f"({bh}, {bw}) of modes 0..13")
    argb = ((a[..., 3].astype(np.uint32) << 24)
            | (a[..., 0].astype(np.uint32) << 16)
            | (a[..., 1].astype(np.uint32) << 8)
            | a[..., 2].astype(np.uint32))

    def chans(v: int) -> tuple:
        return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                v & 0xFF)

    res = np.zeros((h, wd), dtype=np.uint32)
    for y in range(h):
        for x in range(wd):
            if y == 0 and x == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = chans(int(argb[y, x - 1]))
            elif x == 0:
                pred = chans(int(argb[y - 1, x]))
            else:
                tr = (int(argb[y, 0]) if x + 1 == wd
                      else int(argb[y - 1, x + 1]))
                pred = _predict(int(modes[y >> size_bits, x >> size_bits]),
                                chans(int(argb[y, x - 1])),
                                chans(int(argb[y - 1, x])),
                                chans(int(argb[y - 1, x - 1])),
                                chans(tr))
            cv = chans(int(argb[y, x]))
            d = tuple((c - p) & 0xFF for c, p in zip(cv, pred))
            res[y, x] = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]
    w = _LsbWriter()
    _write_dims_header(w, wd, h, bool((a[..., 3] != 255).any()))
    w.bits(1, 1)                                  # a transform follows
    w.bits(0, 2)                                  # type 0: predictor
    w.bits(size_bits - 2, 3)
    w.bits(0, 1)                                  # sub-image: no cache
    _write_literal_image(w, modes << 8)           # mode in green channel
    w.bits(0, 1)                                  # end of transforms
    w.bits(0, 1)                                  # main: no color cache
    w.bits(0, 1)                                  # no entropy image
    _write_literal_image(w, res)
    return _riff_wrap(w)
