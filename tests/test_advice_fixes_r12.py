"""Regression tests for the four round-12 ADVICE items: JPEG
trailing bytes after EOI, ZIP64 sentinels as typed errors, PDF
scan-window truncation made visible (scan_ok), and pax/GNU long-name
extension headers applied to the following member."""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile

import pytest


# --- ADVICE 1: jpeg_exif must stop at EOI, not choke on trailers ---

def test_jpeg_exif_ignores_trailing_garbage_after_eoi():
    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        build_exif_app1, jpeg_exif)

    app1 = build_exif_app1(6, "CamCo", "X100", "2026:08:16 12:00:00",
                           "2026:08:15 09:30:00")
    # crawled images commonly carry non-marker bytes after a complete
    # image (server banners, duplicated payloads) — EOI ends the scan
    jpg = b"\xff\xd8" + app1 + b"\xff\xd9" + b"not markers \x00\x01"
    got = jpeg_exif(jpg)
    assert got["has_exif"] == 1 and got["orientation"] == 6
    # no-EXIF arm with the same trailer: clean has_exif=0, no raise
    assert jpeg_exif(b"\xff\xd8\xff\xd9garbage!")["has_exif"] == 0
    # marker sync loss BEFORE EOI is still typed
    with pytest.raises(ValueError, match="marker sync"):
        jpeg_exif(b"\xff\xd8" + b"junk" + app1 + b"\xff\xd9")


# --- ADVICE 2: ZIP64 sentinels are typed errors, not wrong sums ---

def _zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in entries:
            z.writestr(name, data)
    return buf.getvalue()


def test_zip64_entry_size_sentinel_typed():
    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    raw = bytearray(_zip([("a.txt", b"hello")]))
    # locate the central-directory entry and plant the ZIP64 sentinel
    # in its csize/usize fields (offsets 20..28 from the CD signature)
    p = raw.find(b"PK\x01\x02")
    assert p > 0
    raw[p + 20: p + 28] = struct.pack("<II", 0xFFFFFFFF, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="ZIP64"):
        zip_central_stats(bytes(raw))


def test_zip64_eocd_locator_typed():
    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    raw = bytearray(_zip([("a.txt", b"hello")]))
    e = raw.rfind(b"PK\x05\x06")
    assert e > 0
    # splice a ZIP64 EOCD locator (20 bytes) directly before the EOCD
    # — the APPNOTE trigger for ZIP64 semantics (review fix: the
    # sentinel VALUES alone are legal, e.g. exactly 65,535 entries)
    locator = b"PK\x06\x07" + struct.pack("<IQI", 0, 0, 1)
    spliced = bytes(raw[:e]) + locator + bytes(raw[e:])
    with pytest.raises(ValueError, match="ZIP64"):
        zip_central_stats(spliced)
    # a sentinel cd_off WITHOUT the locator is plain corruption, not
    # a silent mis-walk — still typed, different family
    raw[e + 16: e + 20] = struct.pack("<I", 0xFFFFFFFF)
    with pytest.raises(ValueError):
        zip_central_stats(bytes(raw))


def test_plain_zip_still_walks():
    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    s = zip_central_stats(_zip([("a.txt", b"hello"), ("b", b"")]))
    assert s.n_entries == 2 and s.usize_total == 5


# --- ADVICE 3: PDF scan-window truncation visible via scan_ok ---

def test_pdf_scan_ok_clears_when_object_outruns_window():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf, pdf_stats)

    assert pdf_stats(build_pdf(2)).scan_ok == 1
    # grow one page object past the 2048-byte window by a huge
    # /Annots-style filler BEFORE /Type, with real recomputed offsets:
    # easiest honest layout — rebuild by hand
    filler = b"/Annots [" + b" 9 0 R" * 600 + b" ] "
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< " + filler + b"/Type /Page /Parent 2 0 R >>"]
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
    s = pdf_stats(bytes(out))
    assert s.scan_ok == 0          # truncation is VISIBLE
    assert s.xref_ok == 1          # offsets themselves were fine


# --- ADVICE 4: pax/GNU long names key the FOLLOWING member ---

LONG = "shards/" + "d" * 80 + "/" + "n" * 90 + ".jpg"   # > 100+155? no:
LONG2 = "p" * 160 + "/" + "q" * 120 + ".json"           # name>100, no prefix fit


def _tar_fmt(fmt, names):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
        for name in names:
            ti = tarfile.TarInfo(name)
            data = b"x" * 37
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


@pytest.mark.parametrize("fmt", [tarfile.GNU_FORMAT, tarfile.PAX_FORMAT])
def test_long_names_match_stdlib_walk(fmt):
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        tar_entries)

    raw = _tar_fmt(fmt, [LONG2, "short.jpg", LONG2 + ".meta"])
    ents = tar_entries(raw)
    with tarfile.open(fileobj=io.BytesIO(raw)) as t:
        expect = [(i.name, i.size) for i in t.getmembers()]
    # extension headers are consumed: members only, FULL names
    assert [(e.name, e.size) for e in ents] == expect
    assert ents[0].name == LONG2 and ents[0].size == 37


def test_pax_global_path_override_typed():
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        tar_entries)

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT,
                      pax_headers={"path": "evil"}) as t:
        ti = tarfile.TarInfo("ok.txt")
        ti.size = 0
        t.addfile(ti)
    with pytest.raises(ValueError, match="global pax"):
        tar_entries(buf.getvalue())
    # benign global records (comment) pass through
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w", format=tarfile.PAX_FORMAT,
                      pax_headers={"comment": "hello"}) as t:
        ti = tarfile.TarInfo("ok.txt")
        ti.size = 0
        t.addfile(ti)
    assert [e.name for e in tar_entries(buf2.getvalue())] == ["ok.txt"]


def test_webdataset_long_name_grouping(spark):
    """The actual failure mode ADVICE named: long-pathed WebDataset
    samples must group by the FULL path, not the truncated ustar
    name."""
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        webdataset_manifest)

    base = "x" * 120 + "/sample0"
    raw = _tar_fmt(tarfile.PAX_FORMAT,
                   [base + ".jpg", base + ".json",
                    "y" * 120 + "/sample1.jpg"])
    media = spark.createDataFrame([(1, bytearray(raw))],
                                  "doc_id long, content binary")
    r = webdataset_manifest(media).collect()[0]
    assert r["n_entries"] == 3 and r["n_samples"] == 2
    assert r["complete_samples"] == 1      # modal member count is 2
