from __future__ import annotations

from simpy__kafka__flink__kafka_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 250), (3, "u2", 50), (4, "u3", 10)],
        "event_id long, user_id string, ts_ms long",
    )
    right = spark.createDataFrame(
        [("u1", 100, 100), ("u1", 200, 200), ("u2", 60, 60)],
        "user_id string, ts_ms long, click_ms long",
    )
    out = {r.event_id: r.click_ms for r in
           asof_join(left, right, on="user_id", ts="ts_ms",
                     payload_cols=["click_ms"], suffix="").collect()}
    assert out[1] == 100   # tie at equal ts counts ("at or before")
    assert out[2] == 200   # latest of the two prior clicks
    assert out[3] is None  # u2's only click is after the event
    assert out[4] is None  # u3 has no clicks at all
