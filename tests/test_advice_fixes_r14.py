"""Regression tests for the round-14 ADVICE findings.

1. _objstm_objects: non-ascending /ObjStm pair offsets are a spec
   violation (ISO 32000 7.5.7 lays objects back-to-back) — typed
   ValueError, never a guessed end that slices wrong/empty bodies
   (pdffmt.py).
2. pdf_stats: when the dict-window stream cut fires WITHOUT the spec
   EOL after the keyword ('>> stream' inside a literal string or a
   nested-dict tail), the page count may be a lower bound — scan_ok
   must clear, mirroring the endobj-past-window path (pdffmt.py).
3. pack_samples: a non-integral doc_id column gets a loud typed
   refusal up front (matching pack_webdataset_shards' posture), not
   an untyped failure deep inside the Arrow worker (sampling.py).

(The fourth r14 ADVICE item — salting gopher_repetition's gram hash
with n — is covered with the gram rolling-hash rework in
tests/test_quality_rules.py.)
"""
from __future__ import annotations

import pytest


def _objstm_buf(pairs: list[tuple[int, int]], seg: bytes) -> bytes:
    """A raw, honestly-laid-out /ObjStm object at buffer offset 0."""
    header = " ".join(f"{num} {rel}" for num, rel in pairs).encode()
    data = header + b" " + seg
    first = len(header) + 1
    return (b"9 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d >>"
            b"\nstream\n" % (len(pairs), first, len(data))
            + data + b"\nendstream\nendobj\n")


def test_objstm_non_ascending_offsets_typed():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        _objstm_objects)

    # well-formed control: ascending offsets slice back-to-back bodies
    seg = b"<< /A 1 >> << /B 2 >>"
    ok = _objstm_buf([(1, 0), (2, 11)], seg)
    out = _objstm_objects(ok, 0)
    assert out[1].strip() == b"<< /A 1 >>"
    assert out[2].strip() == b"<< /B 2 >>"

    # DESCENDING second offset: typed error, not a len(data) guess
    bad = _objstm_buf([(1, 11), (2, 0)], seg)
    with pytest.raises(ValueError, match="strictly increasing"):
        _objstm_objects(bad, 0)

    # EQUAL offsets violate back-to-back layout the same way
    dup = _objstm_buf([(1, 0), (2, 0)], seg)
    with pytest.raises(ValueError, match="strictly increasing"):
        _objstm_objects(dup, 0)

    # an increasing-but-truncated offset triages DISTINCTLY from a
    # shuffled header (review find r15)
    far = _objstm_buf([(1, 0), (2, 4096)], seg)
    with pytest.raises(ValueError, match="past the decoded data"):
        _objstm_objects(far, 0)


def _classic_pdf(objs: list[bytes]) -> bytes:
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
    return bytes(out)


def test_lenient_stream_cut_clears_scan_ok():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf, pdf_stats)

    # '>> stream' INSIDE a literal string (no spec EOL follows the
    # keyword) truncates the dict window before /Type /Page — the
    # undercount must be visible via scan_ok=0
    trap = _classic_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Name (x >> stream y) /Type /Page >>",
    ])
    st = pdf_stats(trap)
    assert st.scan_ok == 0          # visibly a lower bound now
    assert st.n_pages == 0          # the documented fail-closed cut

    # same layout without the trap string: counted, scan_ok intact
    clean = _classic_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Name (x strea y) /Type /Page >>",
    ])
    st = pdf_stats(clean)
    assert (st.scan_ok, st.n_pages) == (1, 1)

    # a REAL stream keyword (spec EOL present) is not suspect: the
    # fixture writer's content stream keeps scan_ok=1
    st = pdf_stats(build_pdf(2))
    assert (st.scan_ok, st.n_pages) == (1, 2)


def test_pack_samples_refuses_non_integral_doc_id(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        pack_samples)

    bad = spark.createDataFrame(
        [("d-1", "alpha beta"), ("d-2", "gamma")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="integral"):
        pack_samples(bad, max_len=8)

    ok = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], ["doc_id", "text"])
    rows = pack_samples(ok, max_len=8).collect()
    assert sum(r.n_docs for r in rows) == 2
