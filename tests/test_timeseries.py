"""Gap-fill/resampling (operators/timeseries.py): exact interpolation
arithmetic on hand-built series plus the registry row's oracle parity."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.operators.timeseries import gap_fill


def _fill(spark, rows, grid_ms=10):
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, value double")
    out = gap_fill(df, grid_ms=grid_ms)
    return {(r["user_id"], r["grid_ts"]):
            (r["locf_scaled"], r["interp_scaled"])
            for r in out.collect()}


def test_locf_and_linear_interpolation_exact(spark):
    # events at t=5 (v=1.0) and t=25 (v=3.0); grid 10, 20
    got = _fill(spark, [(1, 5, 1.0), (1, 25, 3.0)])
    S = 10 ** 6
    # t=10: locf=1.0; interp = 1 + (3-1)*(10-5)//(25-5) = 1.5
    assert got[(1, 10)] == (1 * S, 1 * S + ((3 - 1) * S * 5) // 20)
    # t=20: interp = 1 + 2*(15)//20 = 2.5
    assert got[(1, 20)] == (1 * S, 1 * S + ((3 - 1) * S * 15) // 20)


def test_grid_on_event_reproduces_value(spark):
    got = _fill(spark, [(1, 10, 2.5), (1, 30, 7.5)])
    S = 10 ** 6
    assert got[(1, 10)] == (int(2.5 * S), int(2.5 * S))
    assert got[(1, 30)] == (int(7.5 * S), int(7.5 * S))
    # midpoint grid t=20 interpolates exactly halfway
    assert got[(1, 20)] == (int(2.5 * S), int(5.0 * S))


def test_edge_fallback_and_empty_span(spark):
    # user 2's last grid point coincides with its last event -> next
    # event exists at the same t (tie: event sorts first, so nt stays
    # ahead); user 3 spans no grid instant -> emits nothing
    got = _fill(spark, [(2, 0, 1.0), (2, 10, 4.0),
                        (3, 11, 9.9), (3, 14, 9.9)])
    S = 10 ** 6
    assert got[(2, 10)] == (4 * S, 4 * S)
    assert not any(u == 3 for u, _ in got)


def test_descending_series_negative_slope(spark):
    got = _fill(spark, [(1, 0, 10.0), (1, 20, 0.0)])
    S = 10 ** 6
    # integer floor division with negative numerator: -10S*10 div 20
    assert got[(1, 10)] == (10 * S, 10 * S + ((-10 * S) * 10) // 20)


def test_registry_row_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["gap_fill_hourly"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "gap_fill_hourly")
