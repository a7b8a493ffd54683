"""Randomized property test: arbitrary span sets through the Spark linker
must always match the O(n²) closed-world linker (hypothesis-driven)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simpy__kafka__flink__kafka_spark.operators.linking import link_traces
from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.sources.generator import closed_world_links

_ips = st.sampled_from([f"10.0.0.{i}" for i in range(4)])
_span = st.tuples(
    st.integers(0, 10_000),      # start
    st.integers(0, 2_000),       # latency
    _ips, _ips,
)


@st.composite
def span_sets(draw):
    raw = draw(st.lists(_span, min_size=1, max_size=25))
    return [
        (f"m{i}", src, dst, s, float(d), s + d)
        for i, (s, d, src, dst) in enumerate(raw)
    ]


@given(spans=span_sets())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_spans_match_closed_world(spark, spans):
    expect = closed_world_links(spans)
    out = link_traces(golden_messages(spark, spans)).collect()
    got = {r["id"]: (list(r["parents"]), list(r["children"])) for r in out}
    assert got == expect
