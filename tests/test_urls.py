"""URL canonicalization (functions/urls.py): rule-by-rule pins plus the
registry rows' oracle parity at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.urls import (
    canonicalize_url, url_dedup)

CASES = [
    # scheme/host case + default port + trailing slash
    ("HTTP://WWW.Example.COM:80/Path/", "http://www.example.com/Path"),
    ("https://a.example.com:443/x", "https://a.example.com/x"),
    # NON-default port survives
    ("http://a.example.com:8080/x", "http://a.example.com:8080/x"),
    # fragment dropped
    ("http://a.example.com/x#frag", "http://a.example.com/x"),
    # tracking params removed, rest sorted; '?' dropped when empty
    ("http://a.example.com/x?utm_source=f&utm_medium=m",
     "http://a.example.com/x"),
    ("http://a.example.com/x?b=2&a=1&fbclid=Z&gclid=Y&msclkid=X",
     "http://a.example.com/x?a=1&b=2"),
    # path CASE is preserved; query value case preserved
    ("http://a.example.com/CaseY?B=2", "http://a.example.com/CaseY?B=2"),
    # bare host, root slash
    ("http://a.example.com/", "http://a.example.com"),
    ("http://a.example.com", "http://a.example.com"),
    # relative href: path/query rules only
    ("/docs/page/?utm_source=x&z=1#top", "/docs/page?z=1"),
    ("", ""),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)],
        "doc_id long, url string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonicalize_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(10, "HTTP://A.example.com:80/x/"),
         (11, "http://a.example.com/x?utm_source=f"),
         (12, "http://a.example.com/x#f"),
         (20, "http://a.example.com/y")],
        "doc_id long, url string")
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert rows["http://a.example.com/x"]["n_docs"] == 3
    assert rows["http://a.example.com/x"]["keeper_doc_id"] == 10
    assert rows["http://a.example.com/y"]["n_docs"] == 1


def test_registry_rows_match_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    reg = registry()
    for name in ("url_canonicalize", "url_dedup"):
        q = reg[name]
        assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, name)


def test_canonicalize_is_zero_shuffle(spark):
    from simpy__kafka__flink__kafka_spark.functions.urls import (
        url_canonicalize)

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h/"), F.col("id").cast("string"))
        .alias("url"))
    plan = url_canonicalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonicalize_is_idempotent(spark):
    # canonical(canonical(u)) == canonical(u) for every rule family --
    # the fixed-point property a keyed dedup stage relies on
    raws = [raw for raw, _ in CASES] + [
        "HTTPS://X.Y:443/a/b/?utm_campaign=c&z=9&utm_id=1#f",
        "http://h:80", "ftp://Mixed.Case/Path/",
    ]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)], "doc_id long, url string")
    once = df.select("doc_id", canonicalize_url("url").alias("c1"))
    twice = once.select("doc_id", "c1",
                        canonicalize_url("c1").alias("c2")).collect()
    for r in twice:
        assert r["c1"] == r["c2"], r


def test_streaming_url_frontier_dedup(spark, tmp_path):
    import os
    import time
    from datetime import datetime, timezone

    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        url_frontier_dedup)

    def _ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        (1, "HTTP://A.example.com:80/x/", _ts(1000)),
        (2, "http://a.example.com/x?utm_source=f", _ts(1001)),  # same canon
        (3, "http://a.example.com/y", _ts(1002)),
    ]
    ind = str(tmp_path / "uf_in")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, url string, ingest_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (
        spark.readStream
        .schema("doc_id long, url string, ingest_ts timestamp")
        .parquet(ind)
        .withWatermark("ingest_ts", "10 minutes")
    )
    name = f"uf_sink_{int(time.time() * 1000)}"
    q = (url_frontier_dedup(stream)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["canonical_url"]: r["doc_id"]
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert set(got) == {"http://a.example.com/x", "http://a.example.com/y"}
