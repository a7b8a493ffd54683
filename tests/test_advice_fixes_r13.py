"""Regression tests for the four round-13 ADVICE findings.

1. _bmff_boxes: a largesize (size==1) box header truncated inside the
   64-bit length field must raise the typed ValueError, not
   struct.error (multimodal.py).
2. surt_key: userinfo ('user:pass@host') never participates in the
   urlkey — SURT drops it, matching the web-prep host rule (urls.py).
3. _scan_strings: PDF name objects (/TD, /Tj as dict keys or BDC
   property operands) must never tokenize as operators and inject
   spurious breaks/shows into pdf_extract_text (pdffmt.py).
4. pack_webdataset_shards: negative ids would diverge between
   Python '%012d' and SQL lpad (and div vs floor) — typed refusal
   (tarfmt.py).
"""
import struct

import pytest


def test_bmff_truncated_largesize_typed():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        _bmff_boxes)

    # 4-byte size == 1 announces a largesize, but the buffer ends
    # before the 8 extra header bytes
    buf = struct.pack(">I", 1) + b"moov" + b"\x00\x00"
    with pytest.raises(ValueError, match="largesize"):
        list(_bmff_boxes(buf, 0, len(buf)))

    # a well-formed largesize box still walks
    body = b"x" * 4
    ok = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 20) + body
    assert list(_bmff_boxes(ok, 0, len(ok))) == [(b"free", 16, 20)]


def test_surt_key_strips_userinfo(spark):
    from simpy__kafka__flink__kafka_spark.functions.urls import surt_key

    cases = [
        ("https://user:pw@www.Example.org/A?b=2&a=1",
         "org,example)/a?a=1&b=2"),
        ("http://alice@sub.example.com:8080/x",
         "com,example,sub:8080)/x"),
        # '@' later in the path must NOT be treated as userinfo
        ("https://example.org/p@ge", "org,example)/p@ge"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    assert got == [w for _, w in cases]


def test_pdf_names_are_not_operators():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        _scan_strings)

    # BDC property list carrying /TD and /Tj as names; the only real
    # operators are BDC, Tj and EMC
    data = (b"/Span <</ActualText (alt) /TD 1 /Tj 2>> BDC "
            b"(shown) Tj EMC")
    toks = list(_scan_strings(data))
    ops = [v for k, v in toks if k == "op"]
    assert ops == ["BDC", "Tj", "EMC"]
    strs = [v for k, v in toks if k == "str"]
    assert strs == [b"alt", b"shown"]


def test_pdf_extract_text_ignores_name_lookalikes():
    """End-to-end: a content stream whose dict keys spell /TD and /Tj
    extracts only the genuinely shown text, no spurious breaks."""
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        pdf_extract_text)

    content = (b"BT /Mark <</TD (x) /Tj (y)>> BDC (hello) Tj EMC "
               b"T* (world) Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF" % (len(objs) + 1, xref_off))
    assert pdf_extract_text(bytes(out)) == "hello\nworld"


def test_webdataset_pack_negative_id_typed(spark):
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        pack_webdataset_shards)

    docs = spark.createDataFrame(
        [(-3, "neg"), (1, "ok")], "doc_id long, text string")
    with pytest.raises(Exception, match="doc_id >= 0"):
        pack_webdataset_shards(docs, samples_per_shard=4).collect()
