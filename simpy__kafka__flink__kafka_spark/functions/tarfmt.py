"""ustar (POSIX tar) header walk + WebDataset sample manifest — the
container of sharded multimodal training data: a WebDataset shard is a
plain tar whose member files group into samples by their path minus
the last extension ("000/123.jpg" + "000/123.json" -> sample
"000/123").  Triage needs the manifest WITHOUT unpacking: entry names,
sizes, per-sample completeness.

Vendored from the public POSIX.1-1988/ustar layout: 512-byte header
blocks (name 100, mode 8, uid 8, gid 8, size 12 octal, mtime 12,
chksum 8, typeflag 1, linkname 100, magic 6, ...), data rounded up to
whole blocks, terminated by two zero blocks.  Header checksums are
VERIFIED (sum of header bytes with the chksum field read as spaces) —
a corrupt block is a typed error, not a mis-walk.  Like the ZIP walk,
fixtures are WRITTEN by stdlib ``tarfile`` and parsed here —
independent-implementation cross-validation.  Nothing is decompressed
or extracted; the walk skips over data by arithmetic, so cost is
microseconds per shard and the only bomb surface (a size field larger
than the buffer) is bounds-checked before the skip.

Reference parity note: no reference counterpart — a training-data
extension operator (WebDataset is the de-facto sharded multimodal
format).
"""

from __future__ import annotations

from dataclasses import dataclass

_BLOCK = 512


@dataclass(frozen=True)
class TarEntry:
    name: str
    size: int
    typeflag: str


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\0", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"tar: bad octal in {what}: {field!r}") from exc


# pax/GNU extension headers are metadata ABOUT the next member, not
# members — their payloads are read (to apply name/size overrides),
# so they get a byte budget a crafted shard cannot blow through
_EXT_HEADER_MAX = 1 << 20


def _pax_records(data: bytes, what: str) -> dict[str, str]:
    """Parse pax '<len> <key>=<value>\\n' records (POSIX.1-2001
    §pax).  len counts the WHOLE record including itself, the space,
    the '=', and the trailing newline; malformed records are typed."""
    recs: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            raise ValueError(f"tar: malformed pax record in {what}")
        try:
            rec_len = int(data[pos:sp])
        except ValueError as exc:
            raise ValueError(
                f"tar: non-numeric pax record length in {what}") from exc
        end = pos + rec_len
        if rec_len <= 0 or end > len(data) or data[end - 1:end] != b"\n":
            raise ValueError(f"tar: pax record length lies in {what}")
        body = data[sp + 1: end - 1]
        eq = body.find(b"=")
        if eq < 0:
            raise ValueError(f"tar: pax record missing '=' in {what}")
        recs[body[:eq].decode("utf-8", errors="replace")] = (
            body[eq + 1:].decode("utf-8", errors="replace"))
        pos = end
    return recs


def tar_entries(content: bytes) -> list[TarEntry]:
    """Walk every ustar member header.  GNU long-name ('L') and pax
    extended ('x') headers are INTERPRETED — their path/size override
    the following member (WebDataset shards with >100/155-char paths
    group correctly instead of keying on the truncated ustar name,
    ADVICE r12) — and consumed (metadata, not members).  A global pax
    header ('g') carrying path/size is a typed error (it would
    silently rewrite every subsequent member); other 'g' records are
    ignored.  Typed errors on: a header block that is neither zero
    nor checksum-valid, a declared size that runs outside the buffer,
    an extension payload past the metadata budget, or a truncated
    archive (no room for the next header)."""
    buf = bytes(content)
    out: list[TarEntry] = []
    off = 0
    next_name: str | None = None
    next_size: int | None = None
    while True:
        if off + _BLOCK > len(buf):
            raise ValueError("tar: truncated archive (no end blocks)")
        block = buf[off: off + _BLOCK]
        if block == b"\0" * _BLOCK:
            if next_name is not None or next_size is not None:
                raise ValueError(
                    "tar: dangling long-name/pax override at archive end")
            return out                       # end-of-archive marker
        declared = _octal(block[148:156], "chksum")
        actual = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if declared != actual:
            raise ValueError(
                f"tar: header checksum mismatch at offset {off}")
        name = block[0:100].split(b"\0", 1)[0].decode(
            "utf-8", errors="replace")
        prefix = block[345:500].split(b"\0", 1)[0].decode(
            "utf-8", errors="replace")
        if prefix:
            name = prefix + "/" + name
        size = _octal(block[124:136], "size")
        data_end = off + _BLOCK + size
        if size < 0 or data_end > len(buf):
            raise ValueError(
                f"tar: entry '{name}' declares {size} bytes past the "
                "end of the buffer")
        typeflag = chr(block[156]) if block[156] else "0"
        if typeflag in ("L", "x", "g", "K"):
            if size > _EXT_HEADER_MAX:
                raise ValueError(
                    f"tar: {size}-byte extension header past the "
                    f"{_EXT_HEADER_MAX}-byte metadata budget")
            data = buf[off + _BLOCK: data_end]
            if typeflag == "L":              # GNU longname, NUL-padded
                next_name = data.split(b"\0", 1)[0].decode(
                    "utf-8", errors="replace")
            elif typeflag == "x":
                recs = _pax_records(data, "pax extended header")
                if "path" in recs:
                    next_name = recs["path"]
                if "size" in recs:
                    try:
                        next_size = int(recs["size"])
                    except ValueError as exc:
                        raise ValueError(
                            "tar: non-numeric pax size record") from exc
            elif typeflag == "g":
                recs = _pax_records(data, "pax global header")
                if "path" in recs or "size" in recs:
                    raise ValueError(
                        "tar: global pax header overriding path/size "
                        "unsupported (would rewrite every member)")
            # 'K' (GNU long linkname) applies to linkname only, which
            # the manifest never reads — consumed without effect
        else:
            if next_name is not None:
                name = next_name
            if next_size is not None:
                size = next_size
                data_end = off + _BLOCK + size
                if size < 0 or data_end > len(buf):
                    raise ValueError(
                        f"tar: pax size override for '{name}' runs "
                        "past the end of the buffer")
            next_name = next_size = None
            out.append(TarEntry(name, size, typeflag))
        off = off + _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK


def _sample_key(name: str) -> str:
    """WebDataset grouping rule: the path minus its LAST extension
    (no dot in the basename -> the name itself is the key)."""
    slash = name.rfind("/")
    dot = name.rfind(".")
    return name[:dot] if dot > slash else name


def webdataset_manifest(media, id_col: str = "doc_id",
                        content_col: str = "content"):
    """Arrow-batched shard manifest: walk each tar shard's headers and
    group regular-file members into WebDataset samples.  Output:
    (id_col, n_entries, n_samples, size_total, complete_samples —
    samples whose member count equals the shard's modal member count
    (a shard is healthy when every sample carries the same modalities;
    stragglers are crawl/packing faults) — and names_md5, the
    length-prefixed order-canonical fingerprint)."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("n_entries", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("size_total", T.LongType(), True),
        T.StructField("complete_samples", T.IntegerType(), True),
        T.StructField("names_md5", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(b: bytes) -> tuple:
                ents = [e for e in tar_entries(bytes(b))
                        if e.typeflag in ("0", "\0")]
                keys: dict[str, int] = {}
                for e in ents:
                    k = _sample_key(e.name)
                    keys[k] = keys.get(k, 0) + 1
                counts = sorted(keys.values())
                # tie on frequency -> the LARGER member count is modal
                # (deterministic; a half-and-half shard reads as the
                # richer samples being canonical)
                modal = (max(set(counts),
                             key=lambda c: (counts.count(c), c))
                         if counts else 0)
                complete = sum(1 for c in keys.values() if c == modal)
                canon = "|".join(f"{len(e.name)}:{e.name}" for e in ents)
                return (len(ents), len(keys),
                        sum(e.size for e in ents), complete,
                        hashlib.md5(canon.encode()).hexdigest())

            o = pdf[content_col].map(stats)
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "n_entries": o.map(lambda t: t[0]).astype("int32"),
                "n_samples": o.map(lambda t: t[1]).astype("int32"),
                "size_total": o.map(lambda t: t[2]).astype("int64"),
                "complete_samples": o.map(lambda t: t[3]).astype("int32"),
                "names_md5": o.map(lambda t: t[4]),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)


# --- WebDataset shard WRITER (round 13) --------------------------------------
# The OUTPUT side of the manifest walk above: pack a corpus into
# sharded tar files (the WebDataset training-delivery format).  The
# writer is hand-laid from the same public ustar spec as the reader —
# and cross-validated the other way around: stdlib tarfile must read
# every shard this writer produces (tests), closing the
# writer/reader/stdlib triangle.

def build_ustar(entries: list[tuple[str, bytes]]) -> bytes:
    """A plain deterministic ustar archive: 512-byte headers (mode
    0644, uid/gid 0, mtime 0 — byte-identical output for identical
    input), data rounded to whole blocks, two zero end blocks.  Names
    longer than the 100-char field raise (the pax/GNU long-name
    WRITING path is not implemented; the reader interprets both)."""
    out = bytearray()
    for name, data in entries:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError(
                f"ustar writer: name longer than 100 bytes: {name!r}")
        if len(data) >= 8 ** 11:
            # the 12-byte octal size field tops out below 8 GiB; a
            # longer octal would GROW the bytearray header past 512
            # and silently corrupt the archive (review find)
            raise ValueError(
                "ustar writer: member size exceeds the 11-digit octal "
                "size field (8 GiB)")
        hdr = bytearray(_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\0"              # mode
        hdr[108:116] = b"0000000\0"              # uid
        hdr[116:124] = b"0000000\0"              # gid
        hdr[124:136] = b"%011o\0" % len(data)    # size
        hdr[136:148] = b"%011o\0" % 0            # mtime
        hdr[148:156] = b" " * 8                  # chksum spaces
        hdr[156] = ord("0")                      # regular file
        hdr[257:263] = b"ustar\0"                # magic
        hdr[263:265] = b"00"                     # version
        chksum = sum(hdr)
        hdr[148:156] = b"%06o\0 " % chksum
        out += hdr + data
        if len(data) % _BLOCK:
            out += bytes(_BLOCK - len(data) % _BLOCK)
    out += bytes(2 * _BLOCK)
    return bytes(out)


def pack_webdataset_shards(docs, samples_per_shard: int = 16,
                           id_col: str = "doc_id",
                           text_col: str = "text"):
    """Pack a document corpus into WebDataset tar shards: doc k lands
    in shard k // samples_per_shard (contiguous-id assignment — at
    cluster scale the ids come from the ranged row_number operators,
    so each shard's docs are co-located and the per-shard group is
    one exchange), each doc contributing ``{id}.txt`` (the text) and
    ``{id}.json`` (metadata), in ascending id order.  One Arrow group
    per shard builds the tar bytes via :func:`build_ustar`.
    Output: (shard_id, n_samples, size_total — payload bytes before
    tar framing, content — the shard bytes)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("size_total", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ])

    def pack(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        entries = []
        total = 0
        for _, row in pdf.iterrows():
            did = int(row[id_col])
            if did < 0:
                # ids must be non-negative: '%012d' signs-then-pads
                # while SQL lpad zero-pads before the minus, and 'div'
                # truncates toward zero vs floor — neither rendering is
                # defined for negatives, so refuse loudly
                raise ValueError(
                    f"pack_webdataset_shards requires {id_col} >= 0, "
                    f"got {did}")
            txt = (row[text_col] or "").encode("utf-8")
            meta = f'{{"id":{did}}}'.encode()
            entries.append((f"{did:012d}.txt", txt))
            entries.append((f"{did:012d}.json", meta))
            total += len(txt) + len(meta)
        return pd.DataFrame({
            "shard_id": [int(key[0])],
            "n_samples": [len(pdf)],
            "size_total": [total],
            "content": [build_ustar(entries)],
        })

    # exact integer division (the repo convention): float '/' would
    # truncate toward zero for negative ids (oracle floors) and lose
    # precision past 2^53 (review find)
    shard = F.expr(f"{id_col} div {int(samples_per_shard)}")
    return (docs.select(F.col(id_col), F.col(text_col),
                        shard.alias("_shard"))
            .groupBy("_shard").applyInPandas(pack, schema))
