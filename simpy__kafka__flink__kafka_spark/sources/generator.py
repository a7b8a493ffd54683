"""Deterministic synthetic trace generator — the batch re-expression of the
reference's SimPy simulator (``/root/reference/simpy_message_generator.py``):
5-tier call tree (Client -> Main; Main -> {Sub1 || Sub2}; Sub2 -> Sub3; 40%
second Main -> Sub2 call, ``:219-317``), per-service IP pools (``:89-110``),
Gaussian inter-arrival (``:330-370``), monotonically increasing ``msg_N`` ids
(``:192-197``), and a chi-square(df=2) send-delay injector capped at 30 s
(``:121-135``) for out-of-order arrival simulation.

Used for property-style tests (seeded, vs the O(n²) closed-world linker) and
as the record feed for streaming tests.  For a live stream the same shapes
map over a ``rate`` source (see ``streaming/pipeline.py``).
"""

from __future__ import annotations

import random

# fixed service times (sim-ms), reference :253-317
T_MAIN_PRE, T_SUB1, T_SUB2, T_SUB3 = 20, 30, 30, 10
T_MAIN_POST = 40
P_SECOND_SUB2 = 0.40


def generate_trace_spans(
    n_traces: int,
    seed: int = 42,
    ip_pool_size: int = 10,
    mean_interarrival_ms: float = 200.0,
    start_ms: int = 1_000_000,
) -> list[tuple]:
    """Returns MSG_SCHEMA tuples (id, src_ip, dst_ip, start, latency, end).

    Containment invariant: every child span's interval lies inside its
    caller span's interval, so the closed-world linker recovers the tree
    (plus any accidental cross-trace matches on shared IPs — those are
    legitimate matches under the rule, not errors).
    """
    rng = random.Random(seed)
    pools = {
        tier: [f"10.{t}.0.{i}" for i in range(ip_pool_size)]
        for t, tier in enumerate(["client", "main", "sub1", "sub2", "sub3"])
    }
    spans: list[tuple] = []
    mid = 0
    t0 = float(start_ms)

    def emit(src: str, dst: str, start: float, end: float) -> None:
        nonlocal mid
        mid += 1
        s, e = int(start), int(end)
        spans.append((f"msg_{mid}", src, dst, s, float(e - s), e))

    for _ in range(n_traces):
        t0 += max(10.0, rng.gauss(mean_interarrival_ms, mean_interarrival_ms / 4))
        ips = {tier: rng.choice(pool) for tier, pool in pools.items()}

        sub1_s = t0 + T_MAIN_PRE
        sub1_e = sub1_s + T_SUB1
        sub2_s = t0 + T_MAIN_PRE
        sub3_s = sub2_s + T_SUB2
        sub3_e = sub3_s + T_SUB3
        sub2_e = sub3_e
        emit(ips["main"], ips["sub1"], sub1_s, sub1_e)
        emit(ips["main"], ips["sub2"], sub2_s, sub2_e)
        emit(ips["sub2"], ips["sub3"], sub3_s, sub3_e)
        last_end = max(sub1_e, sub2_e)

        if rng.random() < P_SECOND_SUB2:
            s2_s = last_end
            s3_s = s2_s + T_SUB2
            s3_e = s3_s + T_SUB3
            emit(ips["main"], ips["sub2"], s2_s, s3_e)
            emit(ips["sub2"], ips["sub3"], s3_s, s3_e)
            last_end = s3_e

        main_e = last_end + T_MAIN_POST
        emit(ips["client"], ips["main"], t0, main_e)

    return spans


def inject_send_delays(
    spans: list[tuple],
    seed: int = 42,
    chisq_df: float = 2.0,
    scale_ms: float = 1000.0,
    cap_ms: float = 30_000.0,
) -> list[tuple]:
    """S6: per-span artificial send delay ~ chi-square(df) * scale, capped
    (reference ``:121-135`` — chi-square(k) == gamma(k/2, 2)).  Returns the
    spans in simulated *arrival* order (start + delay) — the out-of-order
    feed for streaming tests.  Span contents are unchanged."""
    rng = random.Random(seed)
    delayed = []
    for sp in spans:
        delay = min(cap_ms, rng.gammavariate(chisq_df / 2.0, 2.0) * scale_ms / 2.0)
        delayed.append((sp[3] + delay, sp))
    delayed.sort(key=lambda x: (x[0], x[1][0]))
    return [sp for _, sp in delayed]


def rate_latency_expr(v, max_latency_ms: int):
    """Deterministic latency for rate-source tick ``v``, clamped so the max
    emitted latency is <= max_latency_ms: values range over {20, 30, ...,
    ((max-20)//10)*10 + 20} — keeping every span inside the bound that
    streaming_link_edges threads into its range conjunct (a span exceeding
    it would silently miss matches the batch predicate finds).

    ``max_latency_ms`` below the 20 ms floor would silently break the bound
    (steps clamps to 1 and every span emits 20) — rejected at the boundary
    instead."""
    if max_latency_ms < 20:
        raise ValueError(
            f"max_latency_ms must be >= 20 (the emitted floor); got "
            f"{max_latency_ms}"
        )
    steps = max(1, (max_latency_ms - 20) // 10 + 1)
    return (v % steps) * 10 + 20


def rate_spans_source(spark, rows_per_second: int = 100,
                      ip_pool_size: int = 10, max_latency_ms: int = 1920):
    """S5 streaming shape: map Spark's ``rate`` source onto generator-style
    spans — a live unbounded stand-in for the SimPy producer
    (``simpy_message_generator.py:330-370``).  Deterministic per tick:
    IPs/durations derive from the rate ``value`` column, so a given tick
    always produces the same span.

    Match density = rate x span length / (5 * ip_pool_size); widen the pool
    or shorten latencies to keep per-span candidate counts realistic at
    high rates (the join's work is rate x density, not just rate).
    """
    from pyspark.sql import functions as F

    from ..streaming.pipeline import with_event_time

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    v = F.col("value")
    start = F.unix_millis(F.col("timestamp"))
    lat = rate_latency_expr(v, max_latency_ms)
    host = F.floor(v / 5) % ip_pool_size
    return with_event_time(
        rate.select(
            F.concat(F.lit("rt_"), v.cast("string")).alias("id"),
            F.concat(F.lit("10."), (v % 5).cast("string"), F.lit(".0."),
                     host.cast("string")).alias("src_ip"),
            F.concat(F.lit("10."), ((v + 1) % 5).cast("string"), F.lit(".0."),
                     host.cast("string")).alias("dst_ip"),
            start.alias("start_at_ms"),
            lat.cast("double").alias("latency_msec"),
            (start + lat).alias("end_at_ms"),
        )
    )


def closed_world_links(spans: list[tuple]) -> dict[str, tuple[list[str], list[str]]]:
    """O(n²) reference linker (mirrors the predicate of
    ``/root/reference/flink-jobs/linking_utils.py:17-23`` with the
    ``p.id != c.id`` guard; the same double-loop shape as the reference's own
    ``test_chain_linking.py:32-42``).  Returns id -> (sorted parents,
    sorted children)."""
    out: dict[str, tuple[list[str], list[str]]] = {
        sp[0]: (set(), set()) for sp in spans
    }
    for p in spans:
        for c in spans:
            if (
                p[0] != c[0]
                and p[2] == c[1]
                and p[3] <= c[3]
                and p[5] >= c[5]
            ):
                out[c[0]][0].add(p[0])
                out[p[0]][1].add(c[0])
    return {k: (sorted(v[0]), sorted(v[1])) for k, v in out.items()}
