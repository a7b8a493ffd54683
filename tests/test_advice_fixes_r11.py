"""Round-11 ADVICE fixes:
a. ANCHOR_RE tail-walker linearization (no exponential backtracking on
   adversarial quote runs; identical extraction language),
b. mp3 truncated-final-frame accounting,
c. deterministic frontier projection order in streaming corpus keeps,
d. bench scale-dir symlinks resolve for relative SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import time

import duckdb


# --- a. ANCHOR_RE linear tail walker -------------------------------------------


def test_anchor_adversarial_quote_run_is_linear(spark):
    """'<a href=x' followed by a long run of quotes with NO closing '>'
    previously backtracked exponentially in the Java engine (~2.7x per
    4 chars); the linear tail walker must complete instantly and still
    extract the surrounding well-formed anchors."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    evil = '<a href=x ' + '"\'' * 64            # 128 quote chars, no '>'
    page = ('<a href="/before">ok</a>' + evil
            + '<a href="/after">ok too</a>')
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    t0 = time.perf_counter()
    got = {r.target for r in anchor_texts(df).collect()}
    wall = time.perf_counter() - t0
    # the evil tag has no '>' so it matches nothing on its own; BUT the
    # lazy (.*?)</a> lets it legitimately claim up to the NEXT tag's
    # close — so only assert the well-formed /before anchor plus
    # completion well under the exponential blow-up (which exceeds
    # minutes at this length)
    assert "/before" in got
    assert wall < 30.0


def test_anchor_tail_rewrite_same_language_as_alternation(spark):
    """The ``[^>]*`` tail matches exactly the language of the retired
    quote-unit-or-lone-quote alternation — spot-checked on the tag-tail
    shapes the alternation was written for, cross-engine."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        ANCHOR_RE, anchor_texts)

    page = ('<a href=/a class="x>y">A</a>'      # '>' inside post-href quote
            "<a href=/b title='t'>B</a>"        # balanced single unit
            '<a href=/c d=">C</a>'              # unbalanced quote then >
            '<a href=/d>D</a>')                 # bare
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = sorted((r.target, r.n_anchors)
                 for r in anchor_texts(df).collect())
    pat = ANCHOR_RE.replace("'", "''")
    con = duckdb.connect()
    want = sorted(con.execute(f"""
        WITH m AS (
          SELECT unnest(regexp_extract_all(?, '{pat}', 0)) AS a),
        p AS (
          SELECT regexp_replace(
                   regexp_extract(a, '{pat}', 1),
                   '(?s)^"(.*)"$|^''(.*)''$', '\\1\\2') AS target
          FROM m)
        SELECT target, CAST(count(*) AS BIGINT) FROM p GROUP BY 1
    """, [page]).fetchall())
    assert got == want
    assert ("/b", 1) in got and ("/d", 1) in got


# --- b. mp3 truncated final frame -----------------------------------------------


def test_mp3_truncated_final_frame_excluded_and_flagged():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        encode_mp3_frames, mp3_stream_stats)

    full = encode_mp3_frames([9, 9, 9])           # 3 CBR frames
    whole = mp3_stream_stats(full)
    assert (whole.n_frames, whole.truncated) == (3, False)
    # cut the last frame's payload short: its header declares a length
    # past the buffer end — the frame must be excluded, not counted
    cut = mp3_stream_stats(full[:-10])
    assert cut.truncated is True
    assert cut.n_frames == 2
    assert cut.duration_ms == whole.duration_ms * 2 // 3
    # a lone truncated frame leaves NO countable frame -> typed error
    one = encode_mp3_frames([9])
    import pytest

    with pytest.raises(ValueError):
        mp3_stream_stats(one[:-10])
    # a trailing non-sync tag (ID3v1-style) is NOT truncation
    tagged = mp3_stream_stats(full + b"TAG" + bytes(125))
    assert (tagged.n_frames, tagged.truncated) == (3, False)


# --- c. deterministic frontier keep order ---------------------------------------


def test_crawl_admission_keep_projection_is_sorted():
    """The streaming front door's frontier projection must not depend on
    Python set iteration order (hash randomization across restarts of a
    checkpointed query): the derived keep tuple is sorted."""
    keep = ("url", "snap_id")
    derived = tuple(sorted({"html", "headers", "text", *keep}
                           - {"doc_id", "ingest_ts", "url"}))
    assert derived == ("headers", "html", "snap_id", "text")
