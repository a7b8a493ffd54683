"""Header-only image dims (functions/multimodal.py:image_dims /
image_container_stats / webp_synth_dims): every container's dimensions
come from headers alone — including WebP in all three container kinds,
whose pixel decode remains the documented seam."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    encode_png, encode_ppm, encode_webp_stub, image_container_stats,
    image_dims)


def test_decodable_formats_header_dims():
    from simpy__kafka__flink__kafka_spark.functions.bmp import encode_bmp
    from simpy__kafka__flink__kafka_spark.functions.gif import encode_gif
    from simpy__kafka__flink__kafka_spark.functions.jpeg import encode_jpeg
    from simpy__kafka__flink__kafka_spark.functions.tiff import encode_tiff

    px = (np.arange(5 * 7 * 3, dtype=np.uint8).reshape(7, 5, 3))
    assert image_dims(encode_ppm(px)) == ("ppm", 5, 7)
    assert image_dims(encode_png(px)) == ("png", 5, 7)
    assert image_dims(encode_jpeg(px)) == ("jpeg", 5, 7)
    assert image_dims(encode_gif(px)) == ("gif", 5, 7)
    assert image_dims(encode_bmp(px)) == ("bmp", 5, 7)
    assert image_dims(encode_tiff(px)) == ("tiff", 5, 7)
    # big-endian TIFF: hand-build the minimal MM header + one IFD
    # (SHORT values occupy the FIRST two bytes of the value field)
    import struct

    def entry(tag, val):
        return struct.pack(">HHI", tag, 3, 1) + struct.pack(">H", val) \
            + b"\x00\x00"

    mm = (b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", 2)
          + entry(256, 5) + entry(257, 7) + struct.pack(">I", 0))
    assert image_dims(mm) == ("tiff", 5, 7)


def test_webp_all_three_kinds():
    assert image_dims(encode_webp_stub(640, 480, "lossless")) == (
        "webp", 640, 480)
    assert image_dims(encode_webp_stub(640, 480, "lossy")) == (
        "webp", 640, 480)
    assert image_dims(encode_webp_stub(16384, 3000, "extended")) == (
        "webp", 16384, 3000)  # beyond the 14-bit VP8 limit


def test_dims_typed_errors():
    with pytest.raises(ValueError):
        image_dims(b"")
    with pytest.raises(ValueError):
        image_dims(b"not an image at all")
    # truncated PNG (magic only)
    with pytest.raises(ValueError):
        image_dims(b"\x89PNG\r\n\x1a\n")
    # WebP with a corrupted VP8 sync code
    bad = bytearray(encode_webp_stub(8, 8, "lossy"))
    bad[23] = 0x00
    with pytest.raises(ValueError, match="sync"):
        image_dims(bytes(bad))
    # JPEG with no SOF marker
    with pytest.raises(ValueError, match="SOF"):
        image_dims(b"\xff\xd8\xff\xe0\x00\x04ab\xff\xd9\x00\x00")


def test_jpeg_fill_bytes_before_sof():
    """JPEG permits any number of 0xFF fill bytes before a marker; the
    walk must skip them, not derail."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"ab"
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 7, 5) + b"\x01\x11\x00")
    buf = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    assert image_dims(buf) == ("jpeg", 5, 7)


def test_bmp_core_header_and_unknown_dib():
    import struct

    core = (b"BM" + struct.pack("<I", 26) + bytes(4)
            + struct.pack("<I", 26) + struct.pack("<I", 12)
            + struct.pack("<HHHH", 100, 50, 1, 24))
    assert image_dims(core) == ("bmp", 100, 50)
    weird = (b"BM" + struct.pack("<I", 30) + bytes(4)
             + struct.pack("<I", 30) + struct.pack("<I", 16) + bytes(12))
    with pytest.raises(ValueError, match="DIB header"):
        image_dims(weird)


def test_dims_bounds_checked():
    """A header declaring a >= 2^31 dimension must raise, not wrap to a
    negative int32 in the Arrow cast."""
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 2**31 + 5, 10) + b"\x08\x02\x00\x00\x00"
           + bytes(4))
    with pytest.raises(ValueError, match="invalid dims"):
        image_dims(png)


def test_webp_stub_rejects_unrepresentable_dims():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_webp_stub)

    with pytest.raises(ValueError, match="cannot represent"):
        encode_webp_stub(20000, 10, "lossless")
    with pytest.raises(ValueError, match="cannot represent"):
        encode_webp_stub(16384, 10, "lossy")  # lossy stores width direct
    assert image_dims(encode_webp_stub(16384, 10, "lossless")) == (
        "webp", 16384, 10)
    assert image_dims(encode_webp_stub(16383, 10, "lossy")) == (
        "webp", 16383, 10)


def test_image_container_stats_arrow_path(spark):
    px = np.zeros((3, 4, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(px))),
        (2, bytearray(encode_webp_stub(100, 50, "lossless"))),
        (3, bytearray(encode_webp_stub(33, 22, "lossy"))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in image_container_stats(media).collect()}
    assert got == {1: ("png", 4, 3), 2: ("webp", 100, 50),
                   3: ("webp", 33, 22)}


def test_webp_synth_dims_matches_id_arithmetic(spark):
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        webp_synth_dims)

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in webp_synth_dims(docs).collect()}
    for i in range(20):
        assert got[i] == ("webp", 4 + i % 13, 3 + i % 7)


# --- AVIF (round 11): ISO-BMFF box walk to ispe ---------------------------------


def test_avif_header_dims_and_first_ispe_rule():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub)

    assert image_dims(encode_avif_stub(1920, 1080)) == ("avif", 1920, 1080)
    # a second (thumbnail) ispe after the primary must not win
    assert image_dims(encode_avif_stub(640, 480, extra_ispe=(64, 48))) == (
        "avif", 640, 480)


def test_avif_largesize_and_avis_brand():
    """size==1 boxes read the 64-bit largesize; the avis (sequence)
    brand walks the same tree."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub)

    buf = bytearray(encode_avif_stub(12, 34))
    # rewrite the meta box (follows ftyp) as a largesize box
    (meta_off,) = struct.unpack(">I", buf[0:4])
    (size,) = struct.unpack(">I", buf[meta_off:meta_off + 4])
    body = bytes(buf[meta_off + 8:meta_off + size])
    large = (struct.pack(">I", 1) + b"meta"
             + struct.pack(">Q", 16 + len(body)) + body)
    assert image_dims(bytes(buf[:meta_off]) + large) == ("avif", 12, 34)
    buf2 = bytearray(encode_avif_stub(7, 8))
    buf2[8:12] = b"avis"
    assert image_dims(bytes(buf2)) == ("avif", 7, 8)


def test_avif_largesize_ftyp_brand_walk():
    """A size==1 ftyp box stores its brands after the 64-bit largesize;
    the brand walk must not read the largesize bytes as the major
    brand."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub)

    buf = bytearray(encode_avif_stub(21, 12))
    (size,) = struct.unpack(">I", buf[0:4])
    body = bytes(buf[8:size])                   # brands payload
    rest = bytes(buf[size:])
    large_ftyp = (struct.pack(">I", 1) + b"ftyp"
                  + struct.pack(">Q", 16 + len(body)) + body)
    assert image_dims(large_ftyp + rest) == ("avif", 21, 12)


def test_avif_compatible_brand_only():
    """MIAF permits major brand mif1 with avif listed only in the
    compatible brands — the walk must still claim it."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub)

    buf = bytearray(encode_avif_stub(31, 17))
    assert bytes(buf[8:12]) == b"avif"
    buf[8:12] = b"mif1"          # compat list still carries 'avif'
    assert image_dims(bytes(buf)) == ("avif", 31, 17)
    # but a mif1 file with NO avif/avis brand anywhere stays unclaimed
    buf[16:20] = b"heic"
    buf[20:24] = b"mif1"
    with pytest.raises(ValueError, match="unrecognized"):
        image_dims(bytes(buf))


def test_avif_typed_errors():
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub)

    full = encode_avif_stub(100, 200)
    # truncation anywhere in the tree is a typed error (box size
    # overruns its container), never an IndexError/struct.error leak
    for cut in (10, 20, 30, len(full) - 4):
        with pytest.raises(ValueError):
            image_dims(full[:cut])
    # a tree with no ispe property
    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"avif" + bytes(4))
    empty = ftyp + box(b"meta", bytes(4)
                       + box(b"iprp", box(b"ipco", b"")))
    with pytest.raises(ValueError, match="ispe"):
        image_dims(empty)
    # dims bounds: a >= 2^31 width must raise, not wrap
    wild = ftyp + box(b"meta", bytes(4) + box(b"iprp", box(
        b"ipco", box(b"ispe", bytes(4)
                     + struct.pack(">II", 2**31 + 1, 5)))))
    with pytest.raises(ValueError, match="invalid dims"):
        image_dims(wild)


def test_avif_synth_dims_matches_id_arithmetic(spark):
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        avif_synth_dims)

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in avif_synth_dims(docs).collect()}
    for i in range(20):
        assert got[i] == ("avif", 5 + i % 11, 4 + i % 9)
