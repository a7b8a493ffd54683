"""PDF header/xref walk (functions/pdffmt.py): fixture roundtrip,
malformed typing, seams, and the registry row's DuckDB parity."""

from __future__ import annotations

import pytest

from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
    build_pdf, pdf_stats)


def test_walk_counts_objects_and_pages():
    for k in (1, 2, 4):
        s = pdf_stats(build_pdf(k))
        assert (s.n_pages, s.n_objects, s.size_declared, s.xref_ok) == \
            (k, k + 3, k + 4, 1)
        assert s.version == "1.4" and s.has_encrypt == 0


def test_encrypt_flag_and_broken_offsets():
    raw = build_pdf(2).replace(b"/Root 1 0 R",
                               b"/Root 1 0 R /Encrypt 9 0 R")
    assert pdf_stats(raw).has_encrypt == 1
    # corrupt ONE xref offset: the walk flags xref_ok=0 instead of
    # mis-walking (the entry no longer lands on its object header)
    bad = bytearray(build_pdf(2))
    x = bytes(bad).find(b"xref")
    first_entry = bytes(bad).find(b" n \n", x) - 16
    bad[first_entry: first_entry + 10] = b"0000000003"
    s = pdf_stats(bytes(bad))
    assert s.xref_ok == 0


def test_malformed_pdf_typed():
    with pytest.raises(ValueError, match="missing %PDF"):
        pdf_stats(b"hello world")
    with pytest.raises(ValueError, match="startxref"):
        pdf_stats(b"%PDF-1.4\nno tail here")
    raw = build_pdf(1)
    # startxref pointing at a digit -> the 1.5+ xref-stream seam
    hacked = raw[:raw.rfind(b"startxref")] + b"startxref\n9\n%%EOF"
    with pytest.raises((ValueError, NotImplementedError)):
        pdf_stats(hacked)
    # entry-count bomb: declare a huge subsection
    bomb = raw.replace(b"0 %d\n" % (1 + 1 + 3),
                       b"0 60000\n")
    with pytest.raises(ValueError):
        pdf_stats(bomb)


def test_pdf_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["pdf_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, "pdf_stats")


def test_no_endobj_flood_is_bounded():
    """Objects with no endobj must not make every entry scan to EOF
    (the review's quadratic find): runtime stays near-linear."""
    import time

    def crafted(n_objects: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i in range(n_objects):
            offsets.append(len(out))
            out += b"%d 0 obj\n<< /Len 1 >>\n" % (i + 1)   # NO endobj
        xref_off = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (n_objects + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
                b"%d\n%%%%EOF" % (n_objects + 1, xref_off))
        return bytes(out)

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        pdf_stats)

    t0 = time.monotonic()
    s = pdf_stats(crafted(8000))
    assert s.n_objects == 8000
    assert time.monotonic() - t0 < 2.0


def test_size_overflow_typed():
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf, pdf_stats)

    raw = build_pdf(1).replace(b"/Size 5", b"/Size 99999999999")
    with pytest.raises(ValueError, match="plausible"):
        pdf_stats(raw)


def test_pdf_text_extraction_roundtrip_and_escapes():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        _scan_strings, build_pdf, build_pdf_text, pdf_extract_text)

    pdf = build_pdf_text(
        ["Hello (world)\nsecond \\ line", "page two"])
    assert pdf_extract_text(pdf) == \
        "Hello (world)\nsecond \\ line\n\npage two"
    # uncompressed stream arm
    assert pdf_extract_text(build_pdf_text(["plain"], flate=False)) \
        == "plain"
    # the stats fixture's empty shared content stream -> empty text
    assert pdf_extract_text(build_pdf(2)) == ""
    # hex strings, TJ arrays, quote operators, octal + nested parens
    toks = list(_scan_strings(
        b"BT [<48656c6c6f> -200 (World)] TJ (x) ' ET"))
    assert ("str", b"Hello") in toks and ("op", "TJ") in toks
    toks2 = list(_scan_strings(rb"(\110i \(nested (deep)\) \101) Tj"))
    assert toks2[0] == ("str", b"Hi (nested (deep)) A")
    # odd-length hex pads a trailing 0 per spec
    toks3 = list(_scan_strings(b"<414> Tj"))
    assert toks3[0] == ("str", b"\x41\x40")


def test_pdf_text_typed_errors():
    import zlib

    import pytest

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_text, pdf_extract_text)

    good = build_pdf_text(["content here"])
    # corrupt the flate payload -> typed
    bad = bytearray(good)
    s = bytes(bad).find(b"stream\n") + 7
    bad[s + 2] ^= 0xFF
    with pytest.raises(ValueError):
        pdf_extract_text(bytes(bad))
    with pytest.raises(ValueError, match="missing %PDF"):
        pdf_extract_text(b"nope")
    # unterminated literal string in an uncompressed stream
    raw = build_pdf_text(["abc"], flate=False).replace(b"(abc)", b"(abc ")
    # (the xref offsets shifted zero bytes: same length replacement? no
    #  -- '(abc ' is same 5 bytes as '(abc)' so offsets hold)
    with pytest.raises(ValueError, match="unterminated"):
        pdf_extract_text(raw)


def test_pdf_text_fuzz_typed_errors_only():
    import random

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_text, pdf_extract_text)

    fixture = build_pdf_text(["fuzz page (one)\nline"], flate=True)
    rng = random.Random(5150)
    for _ in range(300):
        mut = bytearray(fixture)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            out = pdf_extract_text(bytes(mut))
            assert isinstance(out, str)
        except (ValueError, NotImplementedError):
            pass


def test_pdf_text_dict_operands_and_kids_order():
    """Round-13 review fixes: '<<..>>' dict operands in content
    streams (BDC marked content) no longer open a bogus hex-string
    scan, and page order follows the /Pages tree's /Kids array, not
    object numbering."""
    import zlib

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        _scan_strings, pdf_extract_text)

    toks = list(_scan_strings(
        b"/P <</MCID 0>> BDC BT (Hi) Tj ET EMC"))
    assert ("str", b"Hi") in toks

    # hand-laid file whose /Kids order is [5, 3]: page 1 is the
    # HIGHER-numbered object
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
    }
    for num, text in ((4, b"BT (second) Tj ET"), (6, b"BT (first) Tj ET")):
        objs[num] = (b"<< /Length %d >>\nstream\n" % len(text)
                     + text + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for num in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF" % (len(objs) + 1, xref_off))
    assert pdf_extract_text(bytes(out)) == "first\n\nsecond"


def test_pdf_contents_without_stream_typed():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        pdf_extract_text)

    import pytest

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /NotAStream true >>",      # no stream keyword
        5: (b"<< /Length 17 >>\nstream\nBT (stolen) Tj ET\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for num in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF" % (len(objs) + 1, xref_off))
    # pre-fix this silently extracted object 5's "stolen" text
    with pytest.raises(ValueError, match="no stream"):
        pdf_extract_text(bytes(out))


def test_xref_stream_layouts_roundtrip():
    """Round-14: PDF 1.5 cross-reference streams are implemented —
    all four (flate x objstm) fixture layouts extract the same text
    the classic-xref writer's file does, and pdf_stats resolves every
    entry (xref_ok=1, pages counted through ObjStm-resident dicts)."""
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_text, build_pdf_xref_stream, pdf_extract_text,
        pdf_stats)

    texts = ["alpha (one)\nbeta \\ two", "gamma three"]
    want = pdf_extract_text(build_pdf_text(texts))
    for flate in (True, False):
        for objstm in (True, False):
            raw = build_pdf_xref_stream(texts, flate=flate,
                                        objstm=objstm)
            assert pdf_extract_text(raw) == want
            s = pdf_stats(raw)
            assert (s.n_pages, s.xref_ok, s.scan_ok) == (2, 1, 1)
            assert s.version == "1.5"


def test_xref_stream_prev_chain_newest_wins():
    """An incremental update: a second xref stream with /Prev pointing
    at the first, overriding one object.  The newest entry must win
    and the chain must be depth-bounded."""
    import zlib

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_xref_stream, pdf_extract_text)

    base = bytearray(build_pdf_xref_stream(["old text"], objstm=False))
    # locate the ORIGINAL xref stream offset from the tail
    import re
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF\s*$", bytes(base[-256:]))
    old_xref = int(m.group(1))
    base = base[:base.rfind(b"startxref")]

    # append a replacement content stream for object 4 (the content
    # object of a 1-page objstm=False layout: 1 cat, 2 pages, 3 page,
    # 4 content, 6 xref per the writer's numbering)
    new_off = len(base)
    body = b"BT (new text) Tj ET"
    base += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(body)
             + body + b"\nendstream\nendobj\n")
    rows = zlib.compress(b"\x01" + new_off.to_bytes(4, "big") + b"\x00\x00")
    xref2_off = len(base)
    base += (b"9 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] "
             b"/Index [4 1] /Root 1 0 R /Prev %d /Length %d "
             b"/Filter /FlateDecode >>\nstream\n" % (old_xref, len(rows))
             + rows + b"\nendstream\nendobj\n")
    base += b"startxref\n%d\n%%%%EOF" % xref2_off
    assert pdf_extract_text(bytes(base)) == "new text"


def test_xref_stream_typed_errors():
    import re
    import struct

    import pytest

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_xref_stream, pdf_stats)

    good = build_pdf_xref_stream(["x"], flate=False)

    # /W widths are attacker bytes
    bad = good.replace(b"/W [1 4 2]", b"/W [9 4 2]")
    with pytest.raises(ValueError, match="implausible xref stream /W"):
        pdf_stats(bad)

    # /Index row bomb: more rows than the decoded data holds
    bad2 = re.sub(rb"/Size (\d+)", b"/Size 99999", good, count=1)
    bad2 = bad2.replace(b"/W [1 4 2] /Root",
                        b"/W [1 4 2] /Index [0 99999] /Root")
    with pytest.raises(ValueError, match="entry-count bomb"):
        pdf_stats(bad2)

    # startxref pointing at a non-XRef object
    m = re.search(rb"startxref\s+(\d+)", good)
    hacked = good[:m.start(1)] + b"9" + good[m.end(1):]
    with pytest.raises(ValueError):
        pdf_stats(hacked)


def test_xref_stream_mutation_fuzz_typed_only():
    """Random byte mutations over the 1.5 fixture must only ever
    produce typed errors or a successful walk — never an untyped
    crash (the container-walk fuzz posture)."""
    import random

    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_xref_stream, pdf_extract_text, pdf_stats)

    fixture = build_pdf_xref_stream(["page one text", "page two"],
                                    flate=True)
    rng = random.Random(1414)
    for _ in range(300):
        mut = bytearray(fixture)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        for fn in (pdf_stats, pdf_extract_text):
            try:
                fn(bytes(mut))
            except (ValueError, NotImplementedError):
                pass


def test_hybrid_reference_file_resolves_through_xrefstm():
    """Acrobat's 1.4-compat HYBRID layout: startxref points at a
    classic table listing only buffer-resident objects, and the page
    tree hides in an ObjStm reachable only through the trailer's
    /XRefStm.  The walk must merge both (classic entries winning)."""
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf_xref_stream, pdf_extract_text, pdf_stats)

    raw = build_pdf_xref_stream(["hybrid page one", "and two"],
                                hybrid=True)
    assert b"/XRefStm" in raw and b"trailer" in raw
    assert pdf_extract_text(raw) == "hybrid page one\n\nand two"
    s = pdf_stats(raw)
    assert (s.n_pages, s.xref_ok, s.scan_ok) == (2, 1, 1)
