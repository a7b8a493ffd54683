"""End-to-end streaming demo: generator spans -> out-of-order arrival ->
two-phase linking pipeline -> console/memory output.

    python -m simpy__kafka__flink__kafka_spark.streaming.demo [n_traces]

This is the broker-less twin of the reference's docker-compose run
(``/root/reference/README.md:81-128``): the SimPy producer becomes the
deterministic generator, the Kafka topics become a parquet bridge, and the
Flink job becomes the Structured Streaming topology.  With a broker, swap
``file_spans_source`` for ``kafka_spans_source`` and the memory sink for
``kafka_sink`` — the topology in between is identical.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main(n_traces: int = 50) -> None:
    from ..schemas import golden_messages
    from ..session import get_spark
    from ..sources.generator import (closed_world_links, generate_trace_spans,
                                     inject_send_delays)
    from .pipeline import (aggregate_bridge, file_spans_source,
                           link_traces_two_phase)

    spark = get_spark("streaming-demo")
    base = tempfile.mkdtemp(prefix="trace_demo_")
    ind = os.path.join(base, "in")
    os.makedirs(ind)

    spans = generate_trace_spans(n_traces=n_traces, seed=42)
    arrived = inject_send_delays(spans, seed=42, scale_ms=100.0)
    flush = [("__flush__", "10.9.9.9", "10.9.9.8",
              spans[-1][5] + 10_000_000, 10.0, spans[-1][5] + 10_000_010)]
    for rows in [arrived[i::6] for i in range(6)] + [flush]:
        golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)

    t0 = time.perf_counter()
    src = file_spans_source(spark, ind, watermark="30 seconds")
    p1 = link_traces_two_phase(src, os.path.join(base, "bridge"),
                               os.path.join(base, "ck1"))
    p1.processAllAvailable()
    p1.stop()
    out = aggregate_bridge(spark, os.path.join(base, "bridge"))
    q = (out.writeStream.format("memory").queryName("demo_linked")
         .outputMode("append").start())
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT id, parents, children FROM demo_linked ORDER BY id"
    ).collect()
    q.stop()
    wall = time.perf_counter() - t0

    expect = closed_world_links(spans)
    got = {r.id: (list(r.parents), list(r.children)) for r in rows}
    ok = sum(1 for k in got if expect.get(k) == got[k])
    print(f"spans={len(spans)} emitted={len(got)} "
          f"matching_closed_world={ok} wall={wall:.1f}s")
    for r in rows[:5]:
        print(f"  {r.id}: parents={r.parents} children={r.children}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
