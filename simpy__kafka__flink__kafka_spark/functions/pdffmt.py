"""PDF header / xref / trailer walk — header-only triage for the
single biggest non-HTML document format a crawl fetches.  Vendored
from the public PDF 1.x file-structure layout (ISO 32000 / the classic
Adobe spec): ``%PDF-1.x`` header, body of ``N G obj .. endobj``
objects, a cross-reference table of fixed 20-byte entries, a trailer
dictionary, and ``startxref`` + ``%%EOF`` at the tail.

Nothing is decoded or decompressed — content streams are skipped by
the xref offsets — so the walk prices at microseconds per document.
Bomb posture: the xref subsection counts are attacker bytes, so the
declared entry count is validated against the bytes the table actually
spans BEFORE the loop trusts it (the ZIP entry-count-bomb rule), and
every offset is bounds-checked.  Both cross-reference layouts are
walked: classic 20-byte tables AND (round 14 — the former typed seam)
PDF 1.5+ cross-reference STREAMS, including /Prev chains (newest
entry wins, bounded depth) and type-2 entries resolved through
/ObjStm object streams (bounded inflate, header-count validated).
Streams themselves can never live inside an ObjStm (ISO 32000
7.5.7), so content extraction stays buffer-offset based with a typed
error on a violating file.

Reference parity note: no reference counterpart — a training-data
extension operator (document-corpus triage before any text
extraction).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_HEADER_RE = re.compile(rb"^%PDF-(\d+\.\d+)")
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)\s+%%EOF\s*$")
_SUBSEC_RE = re.compile(rb"(\d+)\s+(\d+)\s*\n")
_ENTRY_RE = re.compile(rb"^(\d{10}) (\d{5}) ([nf])[ \r]?\n?$")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)")
_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# how far into an object the /Type key is searched: dictionaries put
# their keys first, so a small window bounds per-entry work — a
# crafted no-endobj object must NOT make every entry scan to EOF
# (review find: that walk was O(entries * filesize))
_OBJ_SCAN_WINDOW = 2048
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_ENCRYPT_RE = re.compile(rb"/Encrypt\b")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b")
_TYPE_XREF_RE = re.compile(rb"/Type\s*/XRef\b")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_INDEX_RE = re.compile(rb"/Index\s*\[([^\]]*)\]")
_PREV_RE = re.compile(rb"/Prev\s+(\d+)")
_XREFSTM_RE = re.compile(rb"/XRefStm\s+(\d+)")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_INT_RE = re.compile(rb"\d+")
# the stream KEYWORD follows the dict's '>>' and is followed by EOL
# (ISO 32000 7.3.8.1) — a bare substring match would truncate on
# 'stream' INSIDE a dict string like (livestream) (review find).
# Payload parsing stays spec-strict (lone CR after the keyword is a
# typed error); the dict-scan TRUNCATION uses the lenient cut so a
# CR-only file fails CLOSED (window cut) rather than leaking payload
# bytes into the scan (second review find)
_STREAM_KW_RE = re.compile(rb">>\s*stream(?:\r\n|\n)")
_STREAM_CUT_RE = re.compile(rb">>\s*stream")


@dataclass(frozen=True)
class PdfStats:
    version: str
    n_objects: int
    n_pages: int
    size_declared: int
    has_encrypt: int
    xref_ok: int
    scan_ok: int


def _walk_xref(buf: bytes, xref_off: int
               ) -> tuple[list[tuple[int, int, bool]], int]:
    """ONE classic-xref walk (round-13 review: pdf_stats and the text
    extractor had drifted into near-copies; both now reach it through
    :func:`_document_objects`, which resolves ``xref_off`` from the
    tail and dispatches on layout).  Returns ``[(obj_num, offset,
    header_verified)]`` for every in-use entry, in table order, plus
    the position just past the table (where ``trailer`` follows).
    Typed errors: the entry-count bomb, malformed entries."""
    pos = xref_off + 4
    while pos < len(buf) and buf[pos: pos + 1] in b"\r\n ":
        pos += 1
    out: list[tuple[int, int, bool]] = []
    while True:
        sm = _SUBSEC_RE.match(buf, pos)
        if not sm:
            break
        first, count = int(sm.group(1)), int(sm.group(2))
        pos = sm.end()
        # entry-count bomb: 20 bytes per entry must exist
        if pos + 20 * count > len(buf):
            raise ValueError(
                f"PDF: xref subsection declares {count} entries past "
                "the end of the buffer")
        for i in range(count):
            raw = buf[pos: pos + 20]
            pos += 20
            em = _ENTRY_RE.match(raw.rstrip(b"\0"))
            if not em:
                raise ValueError(f"PDF: malformed xref entry {raw!r}")
            off, _gen, kind = int(em.group(1)), em.group(2), em.group(3)
            if kind != b"n" or first + i == 0:
                continue
            # ONE module-level pattern matched at off (Pattern.match
            # anchors at off; a ^ would re-anchor at the string start
            # and never fire) — a per-entry compiled pattern thrashed
            # the re cache past 512 objects (review find)
            hm = _OBJ_HEAD_RE.match(buf, off) if off < len(buf) else None
            verified = hm is not None and int(hm.group(1)) == first + i
            out.append((first + i, off, verified))
    return out, pos


def _obj_window(buf: bytes, off: int) -> tuple[bytes | None, bool]:
    """The object's body up to its ``endobj``, bounded by the scan
    window; None when endobj is not found within the window (the
    caller decides how to surface the truncation).  Stream objects
    truncate at their ``stream`` keyword: every consumer scans the
    object's DICTIONARY, and an uncompressed payload (e.g. a raw
    ObjStm carrying '/Type /Page' text) must never leak into the
    dict scan (round-14 find — it duplicated pages).  Second element
    is True when the cut fired WITHOUT the spec EOL after the keyword
    (ISO 32000 7.3.8.1): '>> stream' inside a literal string or a
    nested-dict tail can truncate the window early, so the caller
    must surface the scan as a lower bound (ADVICE r14)."""
    window_end = min(off + _OBJ_SCAN_WINDOW, len(buf))
    endobj = buf.find(b"endobj", off, window_end)
    lim = endobj if endobj >= 0 else window_end
    m = _STREAM_CUT_RE.search(buf, off, lim)
    if m is not None:
        suspect = _STREAM_KW_RE.match(buf, m.start()) is None
        return buf[off:m.start() + 2], suspect
    if endobj < 0:
        return None, False
    return buf[off:endobj], False


def pdf_stats(content: bytes) -> PdfStats:
    """Walk one PDF (classic xref table OR 1.5+ xref stream).
    ``n_objects`` counts in-use entries that actually resolve — an
    offset landing on the declared object header, or an ObjStm slot
    that exists (a mismatch makes ``xref_ok`` 0 rather than
    mis-walking); ``n_pages`` counts resolved objects whose dictionary
    says ``/Type /Page``."""
    buf = bytes(content)
    m = _HEADER_RE.match(buf)
    if not m:
        raise ValueError("not a PDF (missing %PDF- header)")
    version = m.group(1).decode()
    doc = _document_objects(buf)
    n_objects = 0
    n_pages = 0
    xref_ok = doc.xref_ok
    # a lenient-only stream cut ('>> stream' with no spec EOL — e.g.
    # inside a literal string) may have truncated a dict window early,
    # so the page count is a visible lower bound (ADVICE r14)
    scan_ok = 0 if doc.scan_suspect else 1
    for num, body in doc.windows.items():
        n_objects += 1
        if body is None:
            # object bigger than the bounded scan window: /Type may
            # sit past the cut, so the page count is a LOWER bound —
            # visible via scan_ok=0, never silently wrong (ADVICE
            # r12; the window stays bounded so a crafted endobj-free
            # file cannot force O(n^2) rescans)
            scan_ok = 0
            off = doc.offsets[num]
            body = buf[off: off + _OBJ_SCAN_WINDOW]
        # \b excludes '/Type /Pages' (the tree node) by itself
        if _TYPE_PAGE_RE.search(body):
            n_pages += 1
    tdict = doc.tdict
    szm = _SIZE_RE.search(tdict)
    if not szm or not _ROOT_RE.search(tdict):
        raise ValueError("PDF: trailer missing /Size or /Root")
    size_declared = int(szm.group(1))
    # /Size is attacker bytes: a value past int32 would silently WRAP
    # through the stats frame's int32 column (review find), and no
    # real xref table can hold 2^31 20-byte entries anyway
    if size_declared > 2 ** 31 - 1:
        raise ValueError(
            f"PDF: trailer /Size {size_declared} is not a plausible "
            "object count")
    return PdfStats(version, n_objects, n_pages, size_declared,
                    int(bool(_ENCRYPT_RE.search(tdict))), xref_ok,
                    scan_ok)


# --- text extraction (round 13) ----------------------------------------------
# The step the header triage exists to feed: pull the text-show
# strings out of page content streams.  Scope, stated precisely:
# classic-xref files; per-page /Contents N 0 R (direct /Length only);
# raw or /FlateDecode streams (bounded inflate); BT..ET text blocks
# with literal ``(..)`` strings (all spec escapes: \n \r \t \b \f
# \( \) \\ \ooo octal, nested parens, line continuations) and hex
# ``<..>`` strings, shown by Tj / ' / " / TJ; T* ' " Td TD start new
# lines.  Bytes decode latin-1 — font encodings / CID+ToUnicode maps
# are the documented seam (simple WinAnsi-ish text extracts
# faithfully; exotic subset fonts extract as their raw codes), the
# same honesty posture as the codec modules.

_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _kids_of(w: bytes) -> list[int]:
    m = _KIDS_RE.search(w)
    return ([int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
            if m else [])
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R)")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")
_STREAM_MAX = 1 << 22          # per-stream inflate budget (4 MiB)


def _parse_xref_stream(buf: bytes, off: int, depth: int = 0
                       ) -> tuple[dict[int, tuple[int, int, int]], bytes]:
    """Parse one PDF 1.5+ cross-reference STREAM object at ``off``
    (plus its /Prev chain, newest entry winning) into
    ``{obj_num: (type, field2, field3)}`` and return the NEWEST
    stream's dictionary window.  Bomb posture: /W widths are bounded,
    the row count is validated against the decoded byte length, and
    the /Prev chain depth is capped."""
    if depth > 16:
        raise ValueError("PDF: /Prev xref chain deeper than 16")
    hard_end = min(len(buf), off + _STREAM_MAX + 4096)
    m = _STREAM_KW_RE.search(buf, off, hard_end)
    if not m:
        raise ValueError("PDF: xref stream object has no stream keyword")
    head = buf[off:m.start() + 2]
    if not _TYPE_XREF_RE.search(head):
        raise ValueError("PDF: startxref object is not /Type /XRef")
    wm = _W_RE.search(head)
    szm = _SIZE_RE.search(head)
    if not wm or not szm:
        raise ValueError("PDF: xref stream missing /W or /Size")
    w = [int(wm.group(k)) for k in (1, 2, 3)]
    if any(x > 8 for x in w) or sum(w) == 0:
        raise ValueError(f"PDF: implausible xref stream /W {w}")
    size = int(szm.group(1))
    im = _INDEX_RE.search(head)
    if im:
        nums = [int(x.group()) for x in _INT_RE.finditer(im.group(1))]
        if len(nums) % 2:
            raise ValueError("PDF: odd-length xref stream /Index")
        index = list(zip(nums[::2], nums[1::2]))
    else:
        index = [(0, size)]
    data = _content_bytes(buf, off)
    width = sum(w)
    n_rows = sum(c for _, c in index)
    if n_rows * width > len(data):
        raise ValueError(
            f"PDF: xref stream /Index declares {n_rows} rows past the "
            "decoded data — rejected as an entry-count bomb")

    def field(row: bytes, k: int) -> int:
        a = sum(w[:k])
        return int.from_bytes(row[a:a + w[k]], "big") if w[k] else 0

    rows: dict[int, tuple[int, int, int]] = {}
    r = 0
    for first, count in index:
        for i in range(count):
            row = data[(r + i) * width:(r + i + 1) * width]
            # a zero-width type column defaults the type to 1 (spec)
            t = field(row, 0) if w[0] else 1
            rows[first + i] = (t, field(row, 1), field(row, 2))
        r += count
    pm = _PREV_RE.search(head)
    if pm:
        prev_off = int(pm.group(1))
        if prev_off >= len(buf):
            raise ValueError("PDF: /Prev offset outside buffer")
        older, _ = _parse_xref_stream(buf, prev_off, depth + 1)
        older.update(rows)             # newest wins
        rows = older
    return rows, head


_OBJSTM_MAX_N = 1 << 16


def _objstm_objects(buf: bytes, off: int) -> dict[int, bytes]:
    """Extract ``{obj_num: body bytes}`` from the /ObjStm object
    stream at buffer offset ``off`` (ISO 32000 7.5.7): /N pairs of
    'num offset' in the header portion, objects back-to-back from
    /First.  Bounded: /N is capped, offsets validated against the
    decoded length."""
    hard_end = min(len(buf), off + _STREAM_MAX + 4096)
    m = _STREAM_KW_RE.search(buf, off, hard_end)
    head = buf[off:m.start() + 2] if m else b""
    nm = _OBJSTM_N_RE.search(head)
    fm = _OBJSTM_FIRST_RE.search(head)
    if not nm or not fm:
        raise ValueError("PDF: ObjStm missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    if n > _OBJSTM_MAX_N:
        raise ValueError(f"PDF: ObjStm /N {n} is not plausible")
    data = _content_bytes(buf, off)
    if first > len(data):
        raise ValueError("PDF: ObjStm /First past the decoded data")
    nums = [int(x.group()) for x in _INT_RE.finditer(data[:first])]
    if len(nums) < 2 * n:
        raise ValueError("PDF: ObjStm header shorter than /N pairs")
    out: dict[int, bytes] = {}
    for k in range(n):
        num, rel = nums[2 * k], nums[2 * k + 1]
        if first + rel > len(data):
            raise ValueError("PDF: ObjStm object offset past the data")
        if k + 1 < n:
            nxt = nums[2 * k + 3]
            # ISO 32000 7.5.7: pair offsets are byte offsets of
            # back-to-back objects, so they must be strictly
            # increasing and land inside the decoded data.  A
            # spec-violating stream gets the module's typed error,
            # never a guessed end that slices wrong/empty bodies.
            # Two distinct diagnostics (review find r15): a shuffled
            # header and a truncated stream triage differently.
            if nxt <= rel:
                raise ValueError(
                    "PDF: ObjStm pair offsets are not strictly "
                    "increasing")
            if first + nxt > len(data):
                raise ValueError(
                    "PDF: ObjStm pair offset past the decoded data")
            end = first + nxt
        else:
            end = len(data)
        out[num] = data[first + rel:end]
    return out


@dataclass(frozen=True)
class _DocMap:
    windows: dict     # obj_num -> body bytes | None (endobj past window)
    offsets: dict     # obj_num -> buffer offset (buffer-resident only)
    tdict: bytes      # trailer dict (classic) / xref stream dict (1.5+)
    xref_ok: int
    scan_suspect: int  # 1 when any lenient-only stream cut fired


def _document_objects(buf: bytes) -> _DocMap:
    """ONE object-resolution walk shared by :func:`pdf_stats` and the
    text extractor, covering BOTH cross-reference layouts.  Classic
    tables resolve through :func:`_walk_xref`; 1.5+ xref streams
    through :func:`_parse_xref_stream`, with type-2 entries pulled out
    of their /ObjStm containers.  Unverifiable entries (offset header
    mismatch, missing ObjStm slot) clear ``xref_ok`` and are skipped,
    never mis-walked."""
    t = _STARTXREF_RE.search(buf[-256:])
    if not t:
        raise ValueError("PDF: no startxref/%%EOF tail")
    xref_off = int(t.group(1))
    if xref_off >= len(buf):
        raise ValueError("PDF: startxref offset outside buffer")
    if buf[xref_off: xref_off + 4] == b"xref":
        entries, pos = _walk_xref(buf, xref_off)
        windows: dict[int, bytes | None] = {}
        offsets: dict[int, int] = {}
        xref_ok = 1
        suspect = False
        for num, off, verified in entries:
            if not verified:
                xref_ok = 0
                continue
            offsets[num] = off
            windows[num], s = _obj_window(buf, off)
            suspect = suspect or s
        trailer_at = buf.find(b"trailer", pos - 1)
        if trailer_at < 0:
            raise ValueError("PDF: missing trailer")
        tdict = buf[trailer_at: trailer_at + 512]
        # hybrid-reference file (Acrobat's 1.4-compat layout): the
        # classic trailer's /XRefStm points at a cross-reference
        # STREAM carrying the objects hidden from old readers
        # (typically ObjStm-resident) — merge them in, classic
        # entries winning
        xm = _XREFSTM_RE.search(tdict)
        if xm:
            stm_off = int(xm.group(1))
            if stm_off >= len(buf):
                raise ValueError("PDF: /XRefStm offset outside buffer")
            rows, _ = _parse_xref_stream(buf, stm_off)
            rows = {num: rab for num, rab in rows.items()
                    if num not in windows}
            ok, s = _resolve_rows(buf, rows, windows, offsets)
            if not ok:
                xref_ok = 0
            suspect = suspect or s
        return _DocMap(windows, offsets, tdict, xref_ok, int(suspect))
    if not buf[xref_off: xref_off + 1].isdigit():
        raise ValueError("PDF: startxref does not point at an xref "
                         "table or stream object")
    rows, tdict = _parse_xref_stream(buf, xref_off)
    windows = {}
    offsets = {}
    ok, suspect = _resolve_rows(buf, rows, windows, offsets)
    return _DocMap(windows, offsets, tdict, int(ok), int(suspect))


def _resolve_rows(buf: bytes, rows: dict, windows: dict,
                  offsets: dict) -> tuple[bool, bool]:
    """Materialize xref-stream ``rows`` into windows/offsets: type-1
    entries verify the object header at their offset, type-2 entries
    pull bodies out of their (cached) /ObjStm containers.  Returns
    ``(ok, suspect)``: ok False when any in-use entry failed to
    resolve (the caller's xref_ok); suspect True when any window was
    cut by a lenient-only stream keyword (the caller's scan_suspect,
    ADVICE r14)."""
    ok = True
    suspect = False
    for num, (typ, a, _b) in sorted(rows.items()):
        if typ != 1 or num == 0:
            continue
        hm = _OBJ_HEAD_RE.match(buf, a) if a < len(buf) else None
        if hm is None or int(hm.group(1)) != num:
            ok = False
            continue
        offsets[num] = a
        windows[num], s = _obj_window(buf, a)
        suspect = suspect or s
    objstm_cache: dict[int, dict[int, bytes]] = {}
    for num, (typ, a, _b) in sorted(rows.items()):
        if typ != 2:
            continue
        if a not in objstm_cache:
            if a not in offsets:
                ok = False
                continue
            objstm_cache[a] = _objstm_objects(buf, offsets[a])
        body = objstm_cache[a].get(num)
        if body is None:
            ok = False
            continue
        windows[num] = body
    return ok, suspect


def _content_bytes(buf: bytes, off: int) -> bytes:
    """One content object's stream payload, bounded and inflated."""
    import zlib

    # bound the stream-keyword search by THIS object's endobj: an
    # unbounded find would silently borrow the NEXT object's stream
    # and /Length when the referenced object has none (review find —
    # extracting another object's bytes as page text)
    hard_end = min(len(buf), off + _STREAM_MAX + 4096)
    obj_end = buf.find(b"endobj", off, hard_end)
    m = _STREAM_KW_RE.search(buf, off,
                             obj_end if obj_end >= 0 else hard_end)
    if not m:
        raise ValueError("PDF: content object has no stream keyword")
    head = buf[off:m.start() + 2]
    lm = _LENGTH_RE.search(head)
    if not lm:
        raise NotImplementedError(
            "PDF: indirect or missing /Length unsupported (seam)")
    length = int(lm.group(1))
    s = m.end()                      # the keyword's EOL is in the match
    if length > _STREAM_MAX or s + length > len(buf):
        raise ValueError("PDF: stream length outside buffer/budget")
    data = buf[s:s + length]
    if _FLATE_RE.search(head):
        try:
            data = zlib.decompressobj().decompress(data, _STREAM_MAX + 1)
        except zlib.error as exc:
            raise ValueError(f"PDF: corrupt Flate stream: {exc}") from exc
        if len(data) > _STREAM_MAX:
            raise ValueError("PDF: stream inflates past budget")
    return data


_ESC = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
        ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
        ord(")"): b")", ord("\\"): b"\\"}

# PDF name tokens end at whitespace or a delimiter (ISO 32000 §7.2.2-3)
_NAME_STOP = frozenset(b"\x00\t\n\x0c\r ()<>[]{}/%")


def _scan_strings(data: bytes):
    """Yield ('str', bytes) for every literal/hex string and
    ('op', name) for every operator token, in content order."""
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x28:                          # ( literal string
            pos += 1
            depth = 1
            out = bytearray()
            while pos < n and depth:
                b = data[pos]
                if b == 0x5C and pos + 1 < n:  # backslash escape
                    nb = data[pos + 1]
                    if 0x30 <= nb <= 0x37:     # octal \ooo (1-3 digits)
                        oct_s = 0
                        k = 0
                        while (k < 3 and pos + 1 + k < n
                               and 0x30 <= data[pos + 1 + k] <= 0x37):
                            oct_s = oct_s * 8 + (data[pos + 1 + k] - 0x30)
                            k += 1
                        out.append(oct_s & 0xFF)
                        pos += 1 + k
                    elif nb in (0x0A, 0x0D):   # line continuation
                        pos += 2
                        if (nb == 0x0D and pos < n
                                and data[pos] == 0x0A):
                            pos += 1
                    else:
                        out += _ESC.get(nb, bytes([nb]))
                        pos += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if not depth:
                        pos += 1
                        break
                out.append(b)
                pos += 1
            else:
                if depth:
                    raise ValueError("PDF: unterminated literal string")
            yield "str", bytes(out)
        elif data[pos:pos + 2] == b"<<":   # dict open — NOT a hex
            pos += 2                       # string (review find: the
            # second '<' of '<<' opened a bogus hex scan in streams
            # carrying dict operands, e.g. BDC marked content)
        elif c == 0x3E and data[pos + 1:pos + 2] == b">":   # dict close
            pos += 2
        elif c == 0x3C:                    # <hex>
            end = data.find(b">", pos)
            if end < 0:
                raise ValueError("PDF: unterminated hex string")
            hx = bytes(ch for ch in data[pos + 1:end]
                       if not chr(ch).isspace())
            if len(hx) % 2:
                hx += b"0"                     # spec: odd length pads 0
            try:
                yield "str", bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError) as exc:
                raise ValueError("PDF: bad hex string") from exc
            pos = end + 1
        elif c == 0x2F:                    # /Name — consume the whole
            pos += 1                       # token so a name like /TD or
            # /Tj (dict key, BDC property operand) can never be
            # tokenized as an operator and inject spurious breaks/shows
            while pos < n and data[pos] not in _NAME_STOP:
                pos += 1
        elif (0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A
              or c in (0x27, 0x22, 0x2A)):     # operator (incl ' " *)
            end = pos
            while end < n and (0x41 <= data[end] <= 0x5A
                               or 0x61 <= data[end] <= 0x7A
                               or data[end] in (0x27, 0x22, 0x2A)):
                end += 1
            yield "op", data[pos:end].decode("latin-1")
            pos = end
        else:
            pos += 1


def pdf_extract_text(content: bytes) -> str:
    """Text of every page's content stream, in page order (see the
    scope note above).  Tj/'/"/TJ append their string operands;
    T*/'/"/Td/TD break lines; pages join with a blank line."""
    buf = bytes(content)
    if not _HEADER_RE.match(buf):
        raise ValueError("not a PDF (missing %PDF- header)")
    doc = _document_objects(buf)
    objs = doc.windows

    def window(num: int) -> bytes:
        w = objs[num]
        if w is None:
            off = doc.offsets[num]
            w = buf[off: off + _OBJ_SCAN_WINDOW]
        return w

    # DOCUMENT page order comes from the /Pages tree's /Kids arrays
    # (review find: object-number order reorders pages of
    # incrementally-edited files); fall back to object-number order
    # when no walkable tree exists.
    page_objs: list[int] = []
    pages_nodes = [num for num in sorted(objs)
                   if _TYPE_PAGES_RE.search(window(num))]
    kid_lists = {num: _kids_of(window(num)) for num in pages_nodes}
    all_kids = {k for kids in kid_lists.values() for k in kids}
    roots = [num for num in pages_nodes if num not in all_kids]

    def walk(num: int, depth: int) -> None:
        if depth > 32:
            raise ValueError("PDF: /Pages tree deeper than 32")
        w = window(num)
        if _TYPE_PAGES_RE.search(w):
            for kid in _kids_of(w):
                if kid in objs:
                    walk(kid, depth + 1)
        elif _TYPE_PAGE_RE.search(w):
            page_objs.append(num)

    for r in roots:
        walk(r, 0)
    if not roots:
        page_objs = [num for num in sorted(objs)
                     if _TYPE_PAGE_RE.search(window(num))]
    pages: list[int] = []
    for num in page_objs:
        cm = _CONTENTS_RE.search(window(num))
        if cm:
            pages.append(int(cm.group(1)))
    out_pages: list[str] = []
    for cnum in pages:
        if cnum not in objs:
            raise ValueError(f"PDF: /Contents {cnum} not in xref")
        if cnum not in doc.offsets:
            # streams can never live inside an ObjStm (ISO 32000
            # 7.5.7) — a file claiming so is malformed, not a seam
            raise ValueError(
                f"PDF: /Contents {cnum} resolves inside an ObjStm, "
                "which cannot hold streams")
        data = _content_bytes(buf, doc.offsets[cnum])
        lines: list[list[bytes]] = [[]]
        pending: list[bytes] = []
        for kind, val in _scan_strings(data):
            if kind == "str":
                pending.append(val)
                continue
            if val in ("Td", "TD", "T*", "'", '"') and lines[-1]:
                lines.append([])
            if val in ("Tj", "TJ", "'", '"'):
                lines[-1].extend(pending)
            pending = []
        text = "\n".join(
            b"".join(parts).decode("latin-1")
            for parts in lines if parts)
        out_pages.append(text)
    return "\n\n".join(p for p in out_pages if p)


def build_pdf(n_pages: int, version: str = "1.4") -> bytes:
    """Minimal classic-xref PDF fixture writer: catalog + pages node +
    ``n_pages`` page objects + one shared content stream, with REAL
    computed xref offsets — the walk's offset arithmetic is exercised
    against honestly-laid-out files, not string templates."""
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                 ).encode())
    for _ in range(n_pages):
        objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox "
                    b"[0 0 612 792] /Contents %d 0 R >>"
                    % (3 + n_pages))
    objs.append(b"<< /Length 8 >>\nstream\nBT ET q Q\nendstream")

    out = bytearray(f"%PDF-{version}\n".encode())
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n"
    out += b"0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_off))
    return bytes(out)


def build_pdf_text(pages_text: list[str], version: str = "1.4",
                   flate: bool = True) -> bytes:
    """Classic-xref fixture writer with REAL per-page text content
    streams: each page's text becomes ``BT .. (line) Tj T* .. ET``
    (lines split on newline; ``( ) \\`` escaped the spec way),
    Flate-compressed by default.  Offsets computed honestly like
    :func:`build_pdf`; the writer's escaping is independent of the
    reader's unescaping, so a mirrored bug cannot hide."""
    import zlib

    n_pages = len(pages_text)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append((f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                 ).encode())
    for i in range(n_pages):
        objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox "
                    b"[0 0 612 792] /Contents %d 0 R >>"
                    % (3 + n_pages + i))
    for text in pages_text:
        shows = []
        for j, line in enumerate(text.split("\n")):
            esc = (line.replace("\\", "\\\\").replace("(", "\\(")
                   .replace(")", "\\)"))
            shows.append(("T* " if j else "")
                         + "(" + esc + ") Tj")
        body = ("BT /F1 12 Tf 14 TL 72 720 Td "
                + " ".join(shows) + " ET").encode("latin-1")
        if flate:
            body = zlib.compress(body)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
        else:
            head = b"<< /Length %d >>" % len(body)
        objs.append(head + b"\nstream\n" + body + b"\nendstream")

    out = bytearray(f"%PDF-{version}\n".encode())
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_off))
    return bytes(out)


def build_pdf_xref_stream(pages_text: list[str], version: str = "1.5",
                          flate: bool = True,
                          objstm: bool = True,
                          hybrid: bool = False) -> bytes:
    """PDF 1.5 fixture writer: the document's catalog/pages/page
    dictionaries live inside a /ObjStm object stream (``objstm=True``
    — the real-world 1.5 layout) referenced by type-2 entries of a
    cross-reference STREAM (/W [1 4 2], real computed offsets,
    Flate-compressed when ``flate``); content streams stay
    buffer-resident type-1 entries as the spec requires.  Laid out
    from ISO 32000 independently of the reader (the build_pdf_text
    posture)."""
    import zlib

    n = len(pages_text)
    cat_num, pages_num = 1, 2
    page_nums = [3 + i for i in range(n)]
    cont_nums = [3 + n + i for i in range(n)]
    stm_num = 3 + 2 * n
    xref_num = 4 + 2 * n

    kids = " ".join(f"{k} 0 R" for k in page_nums)
    inner = [
        (cat_num, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (pages_num,
         f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ] + [
        (pg, (b"<< /Type /Page /Parent 2 0 R /MediaBox "
              b"[0 0 612 792] /Contents %d 0 R >>" % ct))
        for pg, ct in zip(page_nums, cont_nums)
    ]

    def content_stream(text: str) -> bytes:
        shows = []
        for j, line in enumerate(text.split("\n")):
            esc = (line.replace("\\", "\\\\").replace("(", "\\(")
                   .replace(")", "\\)"))
            shows.append(("T* " if j else "") + "(" + esc + ") Tj")
        body = ("BT /F1 12 Tf 14 TL 72 720 Td "
                + " ".join(shows) + " ET").encode("latin-1")
        if flate:
            body = zlib.compress(body)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
        else:
            head = b"<< /Length %d >>" % len(body)
        return head + b"\nstream\n" + body + b"\nendstream"

    out = bytearray(f"%PDF-{version}\n".encode())
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    objstm_index: dict[int, int] = {}
    if objstm:
        seg = bytearray()
        pairs = []
        for idx, (num, body) in enumerate(inner):
            pairs.append((num, len(seg)))
            seg.extend(body + b" ")
            objstm_index[num] = idx
        header = " ".join(f"{num} {rel}" for num, rel in pairs).encode()
        payload = header + b" " + bytes(seg)
        first = len(header) + 1
        if flate:
            payload = zlib.compress(payload)
            fdecl = b" /Filter /FlateDecode"
        else:
            fdecl = b""
        emit(stm_num,
             b"<< /Type /ObjStm /N %d /First %d /Length %d%s >>"
             b"\nstream\n" % (len(inner), first, len(payload), fdecl)
             + payload + b"\nendstream")
    else:
        for num, body in inner:
            emit(num, body)
    for ct, text in zip(cont_nums, pages_text):
        emit(ct, content_stream(text))

    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0 or (num == stm_num and not objstm):
            # obj 0 is the spec's free head; without an ObjStm its
            # reserved number stays a free entry (numbering hole)
            rows.extend(b"\x00" + (0).to_bytes(4, "big")
                        + (65535).to_bytes(2, "big"))
        elif num in objstm_index:
            rows.extend(b"\x02" + stm_num.to_bytes(4, "big")
                        + objstm_index[num].to_bytes(2, "big"))
        elif num == xref_num:
            rows.extend(b"\x01" + len(out).to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
        else:
            rows.extend(b"\x01" + offsets[num].to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    payload = bytes(rows)
    if flate:
        payload = zlib.compress(payload)
        fdecl = b" /Filter /FlateDecode"
    else:
        fdecl = b""
    xref_off = len(out)
    emit(xref_num,
         b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
         b"/Length %d%s >>\nstream\n" % (size, len(payload), fdecl)
         + payload + b"\nendstream")
    if hybrid:
        # classic table over the buffer-resident objects only, its
        # trailer pointing at the xref STREAM via /XRefStm
        table_at = len(out)
        resident = sorted(offsets)
        out.extend(b"xref\n0 1\n0000000000 65535 f \n")
        for num in resident:
            out.extend(b"%d 1\n%010d 00000 n \n" % (num, offsets[num]))
        out.extend(b"trailer\n<< /Size %d /Root 1 0 R /XRefStm %d >>"
                   b"\nstartxref\n%d\n%%%%EOF"
                   % (size, xref_off, table_at))
        return bytes(out)
    out.extend(b"startxref\n%d\n%%%%EOF" % xref_off)
    return bytes(out)


def pdf_container_stats(media, id_col: str = "doc_id",
                        content_col: str = "content"):
    """Arrow-batched :func:`pdf_stats` over binary payloads.
    Output: (id_col, version, n_objects, n_pages, size_declared,
    has_encrypt, xref_ok, scan_ok) — scan_ok 0 when any object body
    outran the bounded scan window (page count is a lower bound)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("version", T.StringType(), True),
        T.StructField("n_objects", T.IntegerType(), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("size_declared", T.IntegerType(), True),
        T.StructField("has_encrypt", T.IntegerType(), True),
        T.StructField("xref_ok", T.IntegerType(), True),
        T.StructField("scan_ok", T.IntegerType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[content_col].map(lambda b: pdf_stats(bytes(b)))
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "version": o.map(lambda s: s.version),
                "n_objects": o.map(lambda s: s.n_objects).astype("int32"),
                "n_pages": o.map(lambda s: s.n_pages).astype("int32"),
                "size_declared": o.map(lambda s: s.size_declared)
                .astype("int32"),
                "has_encrypt": o.map(lambda s: s.has_encrypt)
                .astype("int32"),
                "xref_ok": o.map(lambda s: s.xref_ok).astype("int32"),
                "scan_ok": o.map(lambda s: s.scan_ok).astype("int32"),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)
