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
every offset is bounds-checked.  Classic-xref files only: an
``/XRefStm`` or a compressed cross-reference STREAM (PDF 1.5+) raises
the typed unsupported error — honest seam, same posture as the codec
modules' documented seams.

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


@dataclass(frozen=True)
class PdfStats:
    version: str
    n_objects: int
    n_pages: int
    size_declared: int
    has_encrypt: int
    xref_ok: int
    scan_ok: int


def pdf_stats(content: bytes) -> PdfStats:
    """Walk one classic-xref PDF.  ``n_objects`` counts in-use ('n')
    xref entries whose offset actually lands on the declared object
    header (a mismatch makes ``xref_ok`` 0 rather than mis-walking);
    ``n_pages`` counts in-use objects whose dictionary says
    ``/Type /Page``."""
    buf = bytes(content)
    m = _HEADER_RE.match(buf)
    if not m:
        raise ValueError("not a PDF (missing %PDF- header)")
    version = m.group(1).decode()
    tail = buf[-256:]
    t = _STARTXREF_RE.search(tail)
    if not t:
        raise ValueError("PDF: no startxref/%%EOF tail")
    xref_off = int(t.group(1))
    if xref_off >= len(buf):
        raise ValueError("PDF: startxref offset outside buffer")
    if buf[xref_off: xref_off + 4] != b"xref":
        if buf[xref_off: xref_off + 1].isdigit():
            raise NotImplementedError(
                "PDF 1.5+ cross-reference STREAM unsupported (classic "
                "xref tables only — documented seam)")
        raise ValueError("PDF: startxref does not point at an xref table")
    pos = xref_off + 4
    while pos < len(buf) and buf[pos: pos + 1] in b"\r\n ":
        pos += 1
    n_objects = 0
    n_pages = 0
    xref_ok = 1
    scan_ok = 1
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
            obj_num = first + i
            # ONE module-level pattern matched at off (Pattern.match
            # anchors at off; a ^ would re-anchor at the string start
            # and never fire) — a per-entry compiled pattern thrashed
            # the re cache past 512 objects (review find)
            hm = _OBJ_HEAD_RE.match(buf, off) if off < len(buf) else None
            if hm is None or int(hm.group(1)) != obj_num:
                xref_ok = 0
                continue
            n_objects += 1
            window_end = min(off + _OBJ_SCAN_WINDOW, len(buf))
            endobj = buf.find(b"endobj", off, window_end)
            if endobj < 0:
                # object bigger than the bounded scan window: /Type
                # may sit past the cut, so the page count is a LOWER
                # bound — visible via scan_ok=0, never silently wrong
                # (ADVICE r12; the window stays bounded so a crafted
                # endobj-free file cannot force O(n^2) rescans)
                scan_ok = 0
            body = buf[off: endobj if endobj >= 0 else window_end]
            # \b excludes '/Type /Pages' (the tree node) by itself
            if _TYPE_PAGE_RE.search(body):
                n_pages += 1
    trailer_at = buf.find(b"trailer", pos - 1)
    if trailer_at < 0:
        raise ValueError("PDF: missing trailer")
    tdict = buf[trailer_at: trailer_at + 512]
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
