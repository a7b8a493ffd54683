"""Structured Streaming topology mirroring the reference job
(``/root/reference/flink-jobs/simpy_kafka_reader.py:320-405``):

Kafka source -> lenient JSON parse -> 30 s bounded-out-of-orderness
watermark -> IP-keyed interval-containment stream-stream self-join ->
id-keyed adjacency aggregation -> Kafka sink (at-least-once).

Spark-first mapping decisions (SURVEY.md §7 Phase 3):

* The role-expansion flat-map (reference ``expand_roles``,
  ``simpy_kafka_reader.py:94-102``) dissolves: a stream-stream self-join on
  ``p.dst_ip == c.src_ip`` IS the per-IP pairing, with join-state eviction
  driven by the watermark instead of per-record timers.
* The containment predicate carries an explicit time-range bound
  (``c.start BETWEEN p.start AND p.start + MAX_LATENCY``) so Spark can derive
  state watermarks for BOTH sides — without it the join state grows forever.
  The bound is sound because ``end = start + latency <= start + MAX_LATENCY``
  (reference spec bound: 20 s, ``requirements-v2.md:17``).
* Spark restricts chaining two stateful operators in one query, so the full
  pipeline is two queries bridged by a sink (mirroring the reference's own
  two-phase design, ``README.md:30``), or — for exact emit-time parity — the
  custom stateful aggregation in ``streaming/stateful.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MAX_LATENCY_MS, MSG_SCHEMA

WATERMARK = "30 seconds"  # SIMPY_MAX_OUT_OF_ORDER_MS=30000 (simpy_kafka_reader.py:28)


def parse_spans(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Lenient JSON parse (reference ``parse_message``,
    ``simpy_kafka_reader.py:67-77``): missing/garbage fields default to
    ""/0/0.0 instead of null."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), MSG_SCHEMA).alias("m")
    )
    return parsed.select(
        F.coalesce("m.id", F.lit("")).alias("id"),
        F.coalesce("m.src_ip", F.lit("")).alias("src_ip"),
        F.coalesce("m.dst_ip", F.lit("")).alias("dst_ip"),
        F.coalesce("m.start_at_ms", F.lit(0)).alias("start_at_ms"),
        F.coalesce("m.latency_msec", F.lit(0.0)).alias("latency_msec"),
        F.coalesce("m.end_at_ms", F.lit(0)).alias("end_at_ms"),
    )


def with_event_time(spans: DataFrame, watermark: str | None = WATERMARK) -> DataFrame:
    """Event time = start_at_ms (reference ``StartAtAssigner``,
    ``simpy_kafka_reader.py:313-317``); bounded out-of-orderness watermark.

    Pass ``watermark=None`` when a downstream stateful operator defines its
    own watermark (Spark allows one definition per query).
    """
    out = spans.withColumn(
        "start_ts", F.timestamp_millis(F.col("start_at_ms"))
    ).withColumn("end_ts", F.timestamp_millis(F.col("end_at_ms")))
    return out.withWatermark("start_ts", watermark) if watermark else out


def streaming_link_edges(spans: DataFrame,
                         max_latency_ms: int = MAX_LATENCY_MS) -> DataFrame:
    """Stream-stream interval-containment self-join (J1).

    Both sides carry the same watermark; the range conjunct bounds each
    side's state to ``watermark + max_latency`` — this is the declarative
    equivalent of the reference's per-record event-time eviction timers
    (``simpy_kafka_reader.py:159-184``).
    """
    p = spans.alias("p")
    c = spans.alias("c")
    cond = (
        (F.col("p.dst_ip") == F.col("c.src_ip"))
        & (F.col("p.id") != F.col("c.id"))
        & (F.col("c.start_ts") >= F.col("p.start_ts"))
        & (
            F.col("c.start_ts")
            <= F.col("p.start_ts") + F.expr(f"INTERVAL {max_latency_ms} MILLISECONDS")
        )
        & (F.col("c.end_at_ms") <= F.col("p.end_at_ms"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p.id").alias("parent_id"),
        F.col("c.id").alias("child_id"),
        F.col("c.start_ts").alias("event_ts"),
    )


def streaming_link_edges_outer(spans: DataFrame,
                               max_latency_ms: int = MAX_LATENCY_MS) -> DataFrame:
    """Left-outer variant of the interval join (SURVEY §2.3 J1's outer
    mapping): every span emits at least one row in its parent role —
    matched ones per child, unmatched ones once with a NULL child_id after
    the watermark closes their match window.  This reproduces the
    reference's every-message-reaches-output observable at the JOIN rather
    than via the aggregation's left-outer assembly; null rows are the
    'childless span' signal."""
    p = spans.alias("p")
    c = spans.alias("c")
    cond = (
        (F.col("p.dst_ip") == F.col("c.src_ip"))
        & (F.col("p.id") != F.col("c.id"))
        & (F.col("c.start_ts") >= F.col("p.start_ts"))
        & (
            F.col("c.start_ts")
            <= F.col("p.start_ts") + F.expr(f"INTERVAL {max_latency_ms} MILLISECONDS")
        )
        & (F.col("c.end_at_ms") <= F.col("p.end_at_ms"))
    )
    return p.join(c, cond, "leftOuter").select(
        F.col("p.id").alias("parent_id"),
        F.col("c.id").alias("child_id"),
        F.col("p.start_ts").alias("event_ts"),
    )


def enrich_spans_static(spans: DataFrame, services: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the span stream against a static
    dimension (IP -> service name).  Stateless on the stream side — Spark
    broadcasts/rescans the static relation per micro-batch, no watermark or
    state involved; the standard pattern for attaching reference data at
    any scale."""
    return spans.join(
        F.broadcast(services), spans.dst_ip == services.ip, "left"
    ).drop("ip")


def expand_updates(edges: DataFrame) -> DataFrame:
    """R4: edge -> add_child@parent + add_parent@child events
    (reference ``expand_updates``, ``simpy_kafka_reader.py:105-115``)."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("add_child").alias("event_type"),
                    F.col("parent_id").alias("key_id"),
                    F.col("child_id").alias("other_id"),
                ),
                F.struct(
                    F.lit("add_parent").alias("event_type"),
                    F.col("child_id").alias("key_id"),
                    F.col("parent_id").alias("other_id"),
                ),
            )
        ).alias("e")
    ).select("e.event_type", "e.key_id", "e.other_id")


def serialize_linked(linked: DataFrame) -> DataFrame:
    """R2: linked record -> single JSON string column for the Kafka sink
    (reference ``simpy_kafka_reader.py:80-91``)."""
    return linked.select(
        F.to_json(
            F.struct(
                "id", "src_ip", "dst_ip", "start_at_ms", "latency_msec",
                "end_at_ms", "parents", "children",
            )
        ).alias("value")
    )


def kafka_spans_source(spark: SparkSession, bootstrap: str, topic: str,
                       starting_offsets: str = "earliest") -> DataFrame:
    """S1: Kafka source (reference ``FlinkKafkaConsumer``,
    ``simpy_kafka_reader.py:345-356``).  Requires a live broker — construct
    only; callers gate execution on broker availability."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return with_event_time(parse_spans(raw))


def kafka_sink(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """S2: at-least-once Kafka sink (reference ``FlinkKafkaProducer``
    AT_LEAST_ONCE, ``simpy_kafka_reader.py:394-402``; Spark's Kafka sink has
    the same delivery posture)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def console_sink(df: DataFrame, mode: str = "append"):
    """S3: debug/print sink (reference ``.print()``,
    ``simpy_kafka_reader.py:392``)."""
    return df.writeStream.format("console").outputMode(mode).start()


def file_spans_source(spark: SparkSession, path: str,
                      watermark: str | None = WATERMARK,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """Spans from a parquet directory, one file per micro-batch — the
    deterministic test stand-in for the Kafka source (same downstream
    topology)."""
    raw = (
        spark.readStream.schema(MSG_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("latestFirst", "false")
        .parquet(path)
    )
    return with_event_time(raw, watermark)


def deduped_link_edges(spans: DataFrame,
                       max_latency_ms: int = MAX_LATENCY_MS) -> DataFrame:
    """Source dedup chained with the interval join in ONE streaming query:
    ``dropDuplicatesWithinWatermark`` -> stream-stream self-join (Spark's
    multi-stateful-operator support).  At-least-once sources (Kafka
    redelivery, file-source replays) produce no duplicate edges, and dedup
    state stays watermark-bounded like the join state."""
    from .windows import dedup_spans

    return streaming_link_edges(dedup_spans(spans), max_latency_ms)


def link_traces_two_phase(spans: DataFrame, bridge_dir: str, checkpoint1: str,
                          watermark: str = WATERMARK,
                          max_latency_ms: int = MAX_LATENCY_MS):
    """Phase 1 of the full streaming pipeline: span stream -> interval join ->
    (edge updates ∪ message events) -> parquet bridge.

    Spark disallows chaining a stream-stream join with a second arbitrary
    stateful operator in one query, so — exactly like the reference's
    two-phase job split by a Kafka topic (``README.md:30``) — phase 2
    (``streaming/stateful.aggregate_updates_stream``) consumes the bridge as
    its own stream.  Returns the started phase-1 query.
    """
    from .stateful import edge_update_events, span_message_events

    edges = streaming_link_edges(spans, max_latency_ms)
    updates = edge_update_events(edges).unionByName(span_message_events(spans))
    return (
        updates.writeStream.format("parquet")
        .option("path", bridge_dir)
        .option("checkpointLocation", checkpoint1)
        .outputMode("append")
        .start()
    )


def link_traces_foreach_batch(spans: DataFrame, accum_dir: str, out_dir: str,
                              checkpoint: str):
    """foreachBatch variant (SURVEY.md §7 Phase 3's 'simplest parity' path):
    each micro-batch appends raw spans to an accumulator and re-links the
    full accumulated set with the BATCH core, overwriting ``out_dir``.

    Exactly the reference's final-result semantics with none of the
    state-management subtlety — correct at backfill/replay scale where the
    accumulated set fits a batch job; the two-phase watermarked pipeline is
    the unbounded-stream path.
    """
    def process(batch_df: DataFrame, batch_id: int) -> None:
        accumulate_and_relink(batch_df, batch_id, accum_dir, out_dir)

    return (
        spans.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def accumulate_and_relink(batch_df: DataFrame, batch_id: int,
                          accum_dir: str, out_dir: str) -> None:
    """One foreachBatch step: accumulate the batch's spans, re-link the full
    set.  foreachBatch is at-least-once — a batch may be re-delivered after a
    failure/restart — so each batch writes to its own ``batch_id=<id>``
    partition with overwrite: a redelivery rewrites the same partition
    instead of appending duplicate span rows (replay-idempotent)."""
    from ..operators.linking import link_traces

    batch_df.select(
        "id", "src_ip", "dst_ip", "start_at_ms", "latency_msec", "end_at_ms"
    ).write.mode("overwrite").parquet(f"{accum_dir}/batch_id={batch_id}")
    spark = batch_df.sparkSession
    all_spans = spark.read.parquet(accum_dir).drop("batch_id")
    link_traces(all_spans).write.mode("overwrite").parquet(out_dir)


def adjacency_update_mode(updates: DataFrame) -> DataFrame:
    """A1's declarative streaming twin: ``groupBy(key_id) + collect_set`` in
    UPDATE output mode — each micro-batch re-emits every touched key with
    its current adjacency arrays (SURVEY §2.4 A1's 'update mode' mapping).

    Simpler than the timer-based stateful operator and fully declarative,
    but a non-windowed aggregation never evicts state, so this is the
    bounded-replay / dashboard path; ``stateful.aggregate_updates_stream``
    remains the unbounded path with the reference's emit-at-watermark
    semantics."""
    return updates.groupBy("key_id").agg(
        F.array_sort(
            F.collect_set(
                F.when(F.col("event_type") == "add_parent", F.col("other_id"))
            )
        ).alias("parents"),
        F.array_sort(
            F.collect_set(
                F.when(F.col("event_type") == "add_child", F.col("other_id"))
            )
        ).alias("children"),
    )


def aggregate_bridge(spark: SparkSession, bridge_dir: str,
                     watermark: str = WATERMARK) -> DataFrame:
    """Phase 2 source+operator: read the bridge stream and apply the
    stateful adjacency aggregation."""
    from .stateful import UPDATE_SCHEMA, aggregate_updates_stream

    updates = (
        spark.readStream.schema(UPDATE_SCHEMA)
        .option("latestFirst", "false")
        .parquet(bridge_dir)
    )
    return aggregate_updates_stream(updates, watermark)


def aggregate_bridge_v2(spark: SparkSession, bridge_dir: str,
                        watermark: str = WATERMARK) -> DataFrame:
    """Phase 2 on the native ``transformWithStateInPandas`` operator
    (``stateful_v2.AdjacencyProcessor``) — same bridge contract as
    :func:`aggregate_bridge`; requires the RocksDB state store
    (``session.enable_rocksdb_state``) and a usable protobuf runtime
    (``_protobuf_compat``)."""
    from .stateful import UPDATE_SCHEMA
    from .stateful_v2 import aggregate_updates_stream_v2

    updates = (
        spark.readStream.schema(UPDATE_SCHEMA)
        .option("latestFirst", "false")
        .parquet(bridge_dir)
    )
    return aggregate_updates_stream_v2(updates, watermark)
