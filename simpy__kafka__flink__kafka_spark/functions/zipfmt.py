"""ZIP central-directory walk — header-only container stats for the
archive formats a crawl actually serves (docx/xlsx/epub/jar/apk are all
ZIP).  Vendored from the public PKWARE APPNOTE structures: the
end-of-central-directory (EOCD) record is found by scanning back from
the tail (its signature can be preceded by a comment of up to 64 KiB),
then the central directory is walked entry by entry.  NOTHING is
decompressed — like the MP3/AVIF walks this prices at microseconds per
document and is safe on untrusted bytes: every length field is bounds-
checked against the actual buffer before use and malformed input
raises the typed ValueError family.

The fixture rows are WRITTEN by stdlib ``zipfile`` and PARSED by this
walk — cross-validation against an independent implementation, the
DEFLATE-stream posture of vp8l's bit-convention check.

Reference parity note: the reference has no archive surface; this is a
training-data extension operator (crawled-asset triage before any
expensive unpack).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_Z64_LOC_SIG = b"PK\x06\x07"
_Z64_EOCD_SIG = b"PK\x06\x06"
_EOCD_FIXED = 22          # bytes before the trailing comment
_CD_FIXED = 46            # fixed central-directory header size
_Z64_LOC_FIXED = 20       # ZIP64 EOCD locator size
_Z64_EOCD_FIXED = 56      # ZIP64 EOCD record fixed portion
_MAX_COMMENT = 1 << 16

_METHOD_NAMES = {0: "stored", 8: "deflate"}


def _zip64_eocd(buf: bytes, loc: int, eocd: int) -> tuple[int, int, int]:
    """Resolve (n_total, cd_size, cd_off) through the ZIP64 EOCD
    locator at ``loc`` (APPNOTE 4.3.15) and the ZIP64 EOCD record it
    points at (4.3.14).  Typed errors on truncation, multi-disk, a
    record offset outside the buffer, or an implausible record size."""
    if loc + _Z64_LOC_FIXED > eocd:
        raise ValueError("ZIP: ZIP64 EOCD locator truncated")
    z_disk, z_off, z_disks = struct.unpack(
        "<IQI", buf[loc + 4: loc + _Z64_LOC_FIXED])
    if z_disk != 0 or z_disks not in (0, 1):
        raise ValueError("ZIP: multi-disk ZIP64 archives unsupported")
    if z_off + _Z64_EOCD_FIXED > len(buf) \
            or buf[z_off: z_off + 4] != _Z64_EOCD_SIG:
        raise ValueError("ZIP: ZIP64 EOCD record missing at the "
                         "locator's offset")
    (rec_size, _vmade, _vneed, disk, cd_disk, n_disk, n_total,
     cd_size, cd_off) = struct.unpack(
        "<QHHIIQQQQ", buf[z_off + 4: z_off + _Z64_EOCD_FIXED])
    # rec_size counts bytes AFTER the 12-byte (sig+size) prefix
    if rec_size < _Z64_EOCD_FIXED - 12 or z_off + 12 + rec_size > len(buf):
        raise ValueError("ZIP: ZIP64 EOCD record size outside buffer")
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        raise ValueError("ZIP: multi-disk ZIP64 archives unsupported")
    return n_total, cd_size, cd_off


def _zip64_extra(extra: bytes, usize: int, csize: int) -> tuple[int, int]:
    """Resolve saturated central-directory sizes through the 0x0001
    ZIP64 extra block (APPNOTE 4.5.3): fields appear in fixed order —
    usize, csize, local-header offset, disk start — but ONLY for the
    fields whose 32-bit column is 0xFFFFFFFF.  Typed error when a
    needed field is absent or the extra blocks are malformed."""
    p = 0
    while p + 4 <= len(extra):
        (xid, size) = struct.unpack("<HH", extra[p: p + 4])
        body = extra[p + 4: p + 4 + size]
        if p + 4 + size > len(extra):
            raise ValueError("ZIP: extra block overruns the extra field")
        if xid == 0x0001:
            q = 0
            if usize == 0xFFFFFFFF:
                if q + 8 > len(body):
                    raise ValueError(
                        "ZIP: ZIP64 extra lacks the uncompressed size "
                        "its sentinel requires")
                (usize,) = struct.unpack("<Q", body[q: q + 8])
                q += 8
            if csize == 0xFFFFFFFF:
                if q + 8 > len(body):
                    raise ValueError(
                        "ZIP: ZIP64 extra lacks the compressed size "
                        "its sentinel requires")
                (csize,) = struct.unpack("<Q", body[q: q + 8])
                q += 8
            # the u64 fields are attacker bytes: an implausible size
            # would overflow the Arrow int64 cast untyped (the mp4
            # walk's 1<<59 rule) — no real archive member approaches
            # 2^47 bytes
            if usize >= 1 << 47 or csize >= 1 << 47:
                raise ValueError(
                    f"ZIP: implausible ZIP64 sizes ({usize}, {csize})")
            return usize, csize
        p += 4 + size
    raise ValueError("ZIP: size sentinel without a ZIP64 extra block")


@dataclass(frozen=True)
class ZipStats:
    n_entries: int
    n_stored: int
    n_deflate: int
    n_other_method: int
    usize_total: int
    csize_total: int
    names: tuple[str, ...]


def zip_central_stats(content: bytes) -> ZipStats:
    """Parse the EOCD + central directory of a ZIP archive.

    Raises the typed ValueError family on: no EOCD in the trailing
    64 KiB + 22 bytes, multi-disk archives, a central directory that
    runs outside the buffer, an entry signature mismatch, or an entry
    count that cannot fit the directory's byte span (an entry-count
    bomb: n_entries is attacker bytes, so it is validated against
    cd_size BEFORE the walk loop trusts it)."""
    buf = bytes(content)
    scan_from = max(0, len(buf) - _EOCD_FIXED - _MAX_COMMENT)
    # the EOCD signature can also occur INSIDE a trailing archive
    # comment (attacker bytes): accept a candidate only when its
    # declared comment length reaches exactly the end of the buffer
    # (stdlib zipfile's consistency rule), scanning earlier otherwise
    pos = buf.rfind(_EOCD_SIG, scan_from)
    while pos >= 0:
        if pos + _EOCD_FIXED <= len(buf):
            (clen,) = struct.unpack(
                "<H", buf[pos + _EOCD_FIXED - 2: pos + _EOCD_FIXED])
            if pos + _EOCD_FIXED + clen == len(buf):
                break
        pos = buf.rfind(_EOCD_SIG, scan_from, pos)
    if pos < 0:
        raise ValueError("ZIP: no end-of-central-directory record")
    (disk, cd_disk, n_disk, n_total, cd_size, cd_off, _comment_len
     ) = struct.unpack("<HHHHIIH", buf[pos + 4: pos + _EOCD_FIXED])
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        raise ValueError("ZIP: multi-disk archives unsupported")
    # ZIP64 (round 14 — the former typed seam, now implemented): an
    # archive with >4 GiB members or >65535 entries carries 0xFFFF /
    # 0xFFFFFFFF sentinels in the EOCD with the real values in a ZIP64
    # EOCD record, located via the ZIP64 EOCD LOCATOR that immediately
    # precedes the EOCD.  Per APPNOTE the locator is the trigger (an
    # archive with exactly 65,535 entries is legal without ZIP64); a
    # sentinel cd_off/cd_size without it falls through to the bounds
    # checks as plain corruption.
    loc = buf.rfind(_Z64_LOC_SIG, max(0, pos - 20), pos)
    if loc >= 0:
        n_total, cd_size, cd_off = _zip64_eocd(buf, loc, pos)
    if cd_off + cd_size > len(buf):
        raise ValueError("ZIP: central directory outside buffer")
    # each entry costs >= _CD_FIXED bytes of directory: a declared
    # count the directory span cannot hold is rejected before looping
    if n_total * _CD_FIXED > cd_size:
        raise ValueError(
            f"ZIP: {n_total} entries cannot fit a {cd_size}-byte "
            "central directory — rejected as an entry-count bomb")
    p = cd_off
    names: list[str] = []
    n_stored = n_deflate = n_other = 0
    usize_total = csize_total = 0
    for _ in range(n_total):
        if buf[p: p + 4] != _CD_SIG or p + _CD_FIXED > len(buf):
            raise ValueError("ZIP: bad central-directory entry")
        (method, csize, usize, name_len, extra_len, comment_len
         ) = struct.unpack("<H II HHH", buf[p + 10: p + 12]
                           + buf[p + 20: p + 28] + buf[p + 28: p + 34])
        end = p + _CD_FIXED + name_len + extra_len + comment_len
        if end > len(buf):
            raise ValueError("ZIP: entry name/extra runs outside buffer")
        names.append(buf[p + _CD_FIXED: p + _CD_FIXED + name_len]
                     .decode("utf-8", errors="replace"))
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            extra = buf[p + _CD_FIXED + name_len:
                        p + _CD_FIXED + name_len + extra_len]
            usize, csize = _zip64_extra(extra, usize, csize)
        if method == 0:
            n_stored += 1
        elif method == 8:
            n_deflate += 1
        else:
            n_other += 1
        usize_total += usize
        csize_total += csize
        p = end
    return ZipStats(n_total, n_stored, n_deflate, n_other,
                    usize_total, csize_total, tuple(names))


def zip_container_stats(media, id_col: str = "doc_id",
                        content_col: str = "content"):
    """Arrow-batched :func:`zip_central_stats` over binary payloads.
    Output: (id_col, n_entries, n_stored, n_deflate, usize_total,
    csize_total, names_md5) — names_md5 is the order-canonical md5 of
    LENGTH-PREFIXED entry names ('{len}:{name}' joined with '|'):
    names are attacker bytes and may legally contain the separator, so
    a bare join would let ['a|b','c'] fingerprint-collide with
    ['a','b|c']."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("n_entries", T.IntegerType(), True),
        T.StructField("n_stored", T.IntegerType(), True),
        T.StructField("n_deflate", T.IntegerType(), True),
        T.StructField("usize_total", T.LongType(), True),
        T.StructField("csize_total", T.LongType(), True),
        T.StructField("names_md5", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(b: bytes) -> tuple:
                s = zip_central_stats(bytes(b))
                canon = "|".join(f"{len(n)}:{n}" for n in s.names)
                return (s.n_entries, s.n_stored, s.n_deflate,
                        s.usize_total, s.csize_total,
                        hashlib.md5(canon.encode()).hexdigest())

            o = pdf[content_col].map(stats)
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "n_entries": o.map(lambda t: t[0]).astype("int32"),
                "n_stored": o.map(lambda t: t[1]).astype("int32"),
                "n_deflate": o.map(lambda t: t[2]).astype("int32"),
                "usize_total": o.map(lambda t: t[3]).astype("int64"),
                "csize_total": o.map(lambda t: t[4]).astype("int64"),
                "names_md5": o.map(lambda t: t[5]),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)
