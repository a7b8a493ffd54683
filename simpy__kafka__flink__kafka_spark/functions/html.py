"""HTML main-content extraction — the FIRST operator of a web-scale
training corpus pipeline (trafilatura / jusText posture): strip
script/style, segment the page into blocks at block-level closing tags,
score each block's link density, and keep only long low-link-density
blocks as main content.  Navigation bars, sidebars of related links, and
link-heavy footers are boilerplate by that rule; body paragraphs are not.

Scale shape: ZERO shuffle — the whole extraction is per-row column
expressions (regexp codegen + higher-order array functions over the
block list), so it rides the ingest scan like the quality/language
scorers.  Block order is array order (split preserves it), so no sort or
window exists anywhere.  Everything stays in the Java-regex/RE2 common
subset (non-greedy quantifiers + inline (?is) flags, no lookarounds, no
backreferences) so the DuckDB oracle runs the IDENTICAL patterns —
extraction parity is arithmetic, not approximate.

Since no image/HTML corpus ships with the testdata, the registry row
synthesizes a deterministic page around ``documents.text`` inside the
query (the same pattern as the live-codec rows that synthesize PPM/FLAC
bytes in plans/dataprep.py) and the oracle synthesizes the identical
page in SQL, so the gate checks synthesis + extraction end-to-end.

Reference parity note: the reference system (SimPy->Kafka->Flink trace
pipeline) has no web-extraction surface; this module belongs to the
training-data-pipeline extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex/RE2 common subset — each pattern is used VERBATIM by the
# DuckDB oracle (plans/dataprep.py), so edits here must stay in the
# shared dialect (no lookarounds, no backreferences).
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_BLOCK_TAGS = (r"p|div|li|h1|h2|h3|h4|h5|h6|nav|header|footer"
               r"|section|article|td|blockquote|ul|ol|table|tr")
# Split at closing AND opening block tags plus <br>: real crawl HTML
# routinely leaves block elements unclosed (<p> without </p>,
# <br>-separated text), and closing-only segmentation merged such
# regions into one oversized block whose aggregate link density could
# misclassify everything in it (round-7 verdict).  Opening-tag splits on
# well-formed pages only add empty fragments, which the txt_len > 0
# filter drops.
BLOCK_SPLIT_RE = (r"(?i)</(?:" + _BLOCK_TAGS + r")>"
                  r"|<(?:" + _BLOCK_TAGS + r")(?:\s[^>]*)?>"
                  r"|<br\s*/?>")
TAG_RE = r"<[^>]*>"
ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"
WS_RE = r"\s+"


def _block_text(b: Column) -> Column:
    """Visible text of one block: tags -> spaces, whitespace collapsed,
    trimmed — identical arithmetic on both engines."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, TAG_RE, " "), WS_RE, " ")
    )


def _anchor_chars(b: Column) -> Column:
    """Total visible characters inside the block's <a>...</a> spans."""
    return F.aggregate(
        F.regexp_extract_all(b, F.lit(ANCHOR_RE), 1),
        F.lit(0),
        lambda acc, a: acc + F.length(_block_text(a)),
    )


def page_blocks(html: Column | str) -> Column:
    """array<struct<txt,txt_len,anchor_len>> of non-empty visible blocks,
    in document order: script/style removed, page split at block-level
    closing tags, per-block visible text + anchor-text length."""
    h = F.col(html) if isinstance(html, str) else html
    clean = F.regexp_replace(F.regexp_replace(h, SCRIPT_RE, " "),
                             STYLE_RE, " ")
    blocks = F.split(clean, BLOCK_SPLIT_RE)
    metas = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("txt"),
            F.length(_block_text(b)).alias("txt_len"),
            _anchor_chars(b).alias("anchor_len"),
        ),
    )
    return F.filter(metas, lambda m: m["txt_len"] > 0)


def extract_main_content(df: DataFrame, html_col: str = "html",
                         id_col: str = "doc_id",
                         min_block_chars: int = 20,
                         link_density_num: int = 1,
                         link_density_den: int = 3) -> DataFrame:
    """jusText-lite boilerplate removal: a block is MAIN CONTENT iff its
    visible text has at least ``min_block_chars`` characters AND its link
    density (anchor-text chars / text chars) is at most
    ``link_density_num / link_density_den`` — compared in integers
    (``anchor_len * den <= txt_len * num``), so both engines decide every
    block identically with no float threshold.

    Zero-shuffle: per-row array expressions only.  Every input doc keeps
    a row (empty pages -> 0 blocks, empty main_text — the keep-empty
    convention shared with bpe_segment / rare_bigram_rate).

    Output: (id_col, n_blocks, n_kept, kept_chars, dropped_chars,
    main_text) — main_text is the kept blocks' text joined with single
    spaces in document order.
    """
    metas = page_blocks(html_col)
    keep = lambda m: (  # noqa: E731 — shared by three expressions below
        (m["txt_len"] >= min_block_chars)
        & (m["anchor_len"] * link_density_den
           <= m["txt_len"] * link_density_num)
    )
    kept = F.filter(metas, keep)
    dropped = F.filter(metas, lambda m: ~keep(m))
    sum_len = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0), lambda acc, m: acc + m["txt_len"]
    )
    return df.select(
        F.col(id_col),
        F.size(metas).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        sum_len(kept).cast("long").alias("kept_chars"),
        sum_len(dropped).cast("long").alias("dropped_chars"),
        F.array_join(
            F.transform(kept, lambda m: m["txt"]), " "
        ).alias("main_text"),
    )


def synthesize_page(id_col: str = "doc_id",
                    text_col: str = "text") -> Column:
    """Deterministic HTML page around a document's text: head with title
    + style + tracking script, a link-only nav, the text as one <p> per
    sentence inside the main div, a sidebar of related links, and a
    link-heavy footer.  Pure column concat (the live-codec synthesis
    pattern); the DuckDB oracle builds the IDENTICAL string, so
    extraction parity covers synthesis too."""
    para = F.regexp_replace(F.col(text_col), r"\. ", ".</p><p>")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col(id_col).cast("string"),
        F.lit("</title><style>body { margin: 0; font: 14px serif }"
              "</style><script type=\"text/javascript\">var tracker "
              "= \"on\"; load();</script></head><body>"
              "<nav><a href=\"/\">Home</a> <a href=\"/docs\">Docs</a> "
              "<a href=\"/about\">About</a></nav>"
              "<div class=\"main\"><p>"),
        para,
        F.lit("</p></div><div class=\"sidebar\">"
              "<li><a href=\"/rel/1\">Related article one</a></li>"
              "<li><a href=\"/rel/2\">Related article two</a></li>"
              "<li><a href=\"/rel/3\">Related article three</a></li>"
              "</div><footer>(c) 2026 <a href=\"/privacy\">Privacy "
              "Policy</a> <a href=\"/terms\">Terms of Service</a> "
              "<a href=\"/contact\">Contact</a></footer></body></html>"),
    )


# --- WARC ingestion ----------------------------------------------------------
# The step BEFORE extraction in a real web pipeline: CommonCrawl ships
# WARC streams (record header block, blank line, payload).  Parsing is
# pure string codegen — record split on the version marker, header
# fields by regexp (RE2/Java common subset), payload by the first blank
# line — so the DuckDB oracle runs the identical arithmetic.

WARC_MARKER = "WARC/1.0\r\n"
WARC_SPLIT_RE = "WARC/1\\.0\\r\\n"     # the marker as an escaped regex
WARC_TYPE_RE = r"WARC-Type: ([^\r]*)"
WARC_URI_RE = r"WARC-Target-URI: ([^\r]*)"
WARC_CLEN_RE = r"Content-Length: ([0-9]+)"


def parse_warc_records(df: DataFrame, warc_col: str = "warc",
                       id_col: str = "doc_id",
                       carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode a WARC stream (concatenated ``WARC/1.0`` records) into one
    row per record with parsed headers and the payload: record index in
    stream order, WARC-Type, WARC-Target-URI, declared Content-Length,
    whether the payload length matches the declaration, and the payload
    itself.  Zero-shuffle (split + posexplode + regexp per row) —
    streaming-safe, which is why per-stream metadata rides through
    ``carry_cols`` (replicated onto every record row) instead of a
    join-back that a streaming plan could not execute.
    Output: (id_col, rec_idx, warc_type, target_uri, content_length,
    payload_ok: int, payload, *carry_cols).
    """
    recs = F.split(F.col(warc_col), WARC_SPLIT_RE, -1)
    exploded = df.select(
        F.col(id_col), *[F.col(c) for c in carry_cols],
        F.posexplode(recs).alias("rec_idx", "_rec")
    ).where(F.length("_rec") > 0)
    # payload starts after the first blank line (header/payload divider)
    div = F.instr(F.col("_rec"), "\r\n\r\n")
    payload = F.when(div > 0, F.substring(
        F.col("_rec"), div + 4, F.lit(2_000_000_000))).otherwise(F.lit(""))
    clen_s = F.regexp_extract("_rec", WARC_CLEN_RE, 1)
    # '' (no Content-Length header) would throw under ANSI cast
    clen = F.when(clen_s != "", clen_s.cast("long"))
    return exploded.select(
        F.col(id_col),
        # records are 1-blank-prefixed by the consumed marker: re-rank
        (F.col("rec_idx") - 1).cast("long").alias("rec_idx"),
        F.regexp_extract("_rec", WARC_TYPE_RE, 1).alias("warc_type"),
        F.regexp_extract("_rec", WARC_URI_RE, 1).alias("target_uri"),
        F.coalesce(clen, F.lit(-1)).alias("content_length"),
        # a record with no Content-Length header has clen NULL — the
        # comparison is NULL, but the documented contract (and the DuckDB
        # oracle's CASE ... ELSE 0) is int 0 for "cannot verify"
        F.coalesce((F.length(payload) == clen).cast("int"), F.lit(0))
        .alias("payload_ok"),
        payload.alias("payload"),
        *[F.col(c) for c in carry_cols],
    )


def gunzip_members(content: bytes,
                   max_bytes: int | None = None) -> tuple[bytes, int]:
    """Concatenated bytes + member count via
    :func:`gunzip_member_spans` (the original surface; the span
    variant exists for CDX indexing, which needs each member's
    compressed byte range)."""
    spans = gunzip_member_spans(content, max_bytes)
    return b"".join(m for _, _, m in spans), len(spans)


def gunzip_member_spans(content: bytes,
                        max_bytes: int | None = None
                        ) -> list[tuple[int, int, bytes]]:
    """Decompress a MULTI-MEMBER gzip stream (the warc.gz convention:
    every WARC record is its own gzip member, so readers can seek to a
    member boundary and start there) into per-member span triples
    (see the Returns paragraph).  BOUNDED: total output is budgeted against the
    compressed payload size (functions/_budget.py:byte_budget — a gzip
    trailer's ISIZE is attacker-controlled, so there is no trusted
    declared size to bound to, unlike PNG's raster), and corrupt or
    truncated members raise the typed ValueError family.

    Input is consumed through a tracked offset over a memoryview in
    fixed chunks — NOT by rebinding the buffer to ``unused_data``
    (which copies the whole remaining stream per member: a stream of
    ~250k empty ~23-byte members would cost O(S^2) memcpy while the
    output budget never trips — a second bomb class the review
    caught; with chunked feeding each member's leftover copy is at
    most one chunk).

    Returns ``[(member_offset, compressed_length, member_bytes)]`` —
    the byte spans are what a CDX index records so a reader can
    range-request one record's member and start decompressing at its
    boundary."""
    import zlib

    from ._budget import byte_budget

    buf = bytes(content)
    payload_len = len(buf)
    budget = byte_budget(payload_len, max_bytes)
    mv = memoryview(buf)
    # per-member geometric feed growth: a tiny member's leftover copy
    # is a tiny slice (empty-member floods cost O(S) total), while a
    # large member quickly reaches full-size feeds
    first_chunk, max_chunk = 1 << 10, 256 << 10
    spans: list[tuple[int, int, bytes]] = []
    total = 0
    off = 0

    def bomb() -> ValueError:
        return ValueError(
            f"gzip stream expands past the {budget}-byte budget for "
            f"a {payload_len}-byte payload — rejected as a "
            "decompression bomb")

    while off < payload_len:
        d = zlib.decompressobj(wbits=31)      # gzip wrapper, CRC checked
        chunk_size = first_chunk
        member_start = off
        member_chunks = []
        while True:
            feed = mv[off: off + chunk_size]
            chunk_size = min(chunk_size * 4, max_chunk)
            try:
                data = d.decompress(feed, budget - total + 1)
                total += len(data)
                member_chunks.append(data)
                if total > budget:
                    raise bomb()
                # max_length can leave input pending even within a chunk
                while d.unconsumed_tail and not d.eof:
                    data = d.decompress(d.unconsumed_tail,
                                        budget - total + 1)
                    total += len(data)
                    member_chunks.append(data)
                    if total > budget:
                        raise bomb()
            except zlib.error as exc:
                raise ValueError(f"corrupt gzip member: {exc}") from exc
            if d.eof:
                # unused_data is bounded by one chunk — the small copy
                off += len(feed) - len(d.unused_data)
                spans.append((member_start, off - member_start,
                              b"".join(member_chunks)))
                break
            off += len(feed)
            if off >= payload_len:
                raise ValueError("truncated gzip member")
    return spans


def parse_warc_gz(media: DataFrame, id_col: str = "doc_id",
                  content_col: str = "content",
                  max_bytes: int | None = None,
                  carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """The real CommonCrawl ingestion shape: a ``.warc.gz`` stream
    (one gzip member per record) decompressed per document in Arrow
    batches — bounded via :func:`gunzip_members` — then parsed by the
    SAME :func:`parse_warc_records` expression pipeline the plain-text
    WARC row uses (one parser rendering; this function only peels the
    compression layer).  Output: parse_warc_records columns plus
    ``n_members`` (gzip members seen — the record/member 1:1 contract
    a warc.gz writer must keep) and any ``carry_cols`` from the input
    (replicated per record — stream metadata like ingest_ts).

    STREAMING-SAFE: one mapInPandas + zero-shuffle expressions, no
    pin, no join — n_members rides the decode frame and fans out with
    the records via the parser's carry path, so the same function
    serves ``readStream.format("binaryFile")`` shards unchanged
    (streaming/corpus.py:warc_gz_source)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    carry = tuple(carry_cols)
    schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False),
         T.StructField("warc", T.StringType(), True),
         T.StructField("n_members", T.IntegerType(), True)]
        + [media.schema[c] for c in carry]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def dec(b: bytes) -> tuple[str, int]:
                raw, members = gunzip_members(bytes(b), max_bytes)
                return raw.decode("utf-8", errors="replace"), members

            o = pdf[content_col].map(dec)
            cols = {
                id_col: pdf[id_col].astype("int64"),
                "warc": o.map(lambda t: t[0]),
                "n_members": o.map(lambda t: t[1]).astype("int32"),
            }
            for c in carry:
                cols[c] = pdf[c]
            yield pd.DataFrame(cols)

    text = media.select(id_col, content_col, *carry).mapInPandas(
        run, schema)
    return parse_warc_records(text, warc_col="warc", id_col=id_col,
                              carry_cols=("n_members",) + carry)


def warc_cdx_entries(media: DataFrame, id_col: str = "doc_id",
                     content_col: str = "content",
                     max_bytes: int | None = None,
                     carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-record CDX capture entries for a ``.warc.gz`` shard (round
    14 — the web-archive INDEXING step: warc.gz in, the columns a
    CDXJ line records out).  One Arrow pass per document:
    :func:`gunzip_member_spans` yields each gzip member's compressed
    byte range (the warc.gz 1:1 record/member convention), the member
    text is parsed with the SAME header patterns the Spark-side
    parser renders, and — because compressed offsets/lengths cannot
    be reproduced by any SQL oracle — every span is machine-verified
    in-pass: the raw ``buf[offset : offset+length]`` slice is
    re-gunzipped standalone and must reproduce the member bit-exactly
    (``slice_ok``), which is precisely the range-request contract a
    CDX consumer relies on.

    Output: (id_col, rec_idx, warc_type, target_uri, member_offset,
    member_length, payload_md5, slice_ok, *carry_cols) — carry_cols
    are replicated onto every record row (the parse_warc_records
    convention: stream metadata rides the frame, never a join-back a
    streaming plan could not execute)."""
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    type_re = _re.compile(WARC_TYPE_RE.encode())
    uri_re = _re.compile(WARC_URI_RE.encode())

    carry = tuple(carry_cols)
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("rec_idx", T.LongType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("member_offset", T.LongType(), True),
        T.StructField("member_length", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("slice_ok", T.IntegerType(), True),
        *[media.schema[c] for c in carry],
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for row in pdf.itertuples(index=False):
                did = getattr(row, id_col)
                buf = bytes(getattr(row, content_col))
                extra = tuple(getattr(row, c) for c in carry)
                for i, (off, ln, member) in enumerate(
                        gunzip_member_spans(buf, max_bytes)):
                    resliced, n = gunzip_members(buf[off:off + ln],
                                                 max_bytes)
                    ok = int(n == 1 and resliced == member)
                    tm = type_re.search(member)
                    um = uri_re.search(member)
                    div = member.find(b"\r\n\r\n")
                    payload = member[div + 4:] if div >= 0 else b""
                    rows.append((
                        int(did), i,
                        tm.group(1).decode("utf-8", "replace")
                        if tm else "",
                        um.group(1).decode("utf-8", "replace")
                        if um else "",
                        off, ln,
                        hashlib.md5(payload).hexdigest(), ok) + extra)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields])

    return media.select(id_col, content_col,
                        *carry).mapInPandas(run, schema)
