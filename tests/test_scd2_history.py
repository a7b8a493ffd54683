"""scd2_history golden semantics: run detection over the observed
snapshot sequence, exclusive valid_to tiling, reverted content opening a
NEW version (SCD2 never merges non-adjacent runs), and observation gaps
spanned by an unchanged run."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.crawl import scd2_history


def _hist(spark, rows):
    df = spark.createDataFrame(rows, "url STRING, snap_id LONG, text STRING")
    out = scd2_history(df).collect()
    return sorted(
        ((r["url"], r["version"], r["valid_from"], r["valid_to"],
          r["last_seen"], r["n_snaps"], r["is_current"]) for r in out))


def test_revert_opens_new_version(spark):
    # A A B A -> three runs; the final A is version 3, not merged with v1
    got = _hist(spark, [
        ("u", 0, "aaa"), ("u", 1, "aaa"), ("u", 2, "bbb"), ("u", 3, "aaa"),
    ])
    assert got == [
        ("u", 1, 0, 2, 1, 2, 0),
        ("u", 2, 2, 3, 2, 1, 0),
        ("u", 3, 3, None, 3, 1, 1),
    ]


def test_gap_spanned_by_unchanged_run(spark):
    # observed at snaps 0, 2, 3 with identical content: ONE run,
    # n_snaps=3 < last_seen - valid_from + 1 = 4 flags the gap
    got = _hist(spark, [("u", 0, "x"), ("u", 2, "x"), ("u", 3, "x")])
    assert got == [("u", 1, 0, None, 3, 3, 1)]


def test_gap_with_change_boundary_at_reobservation(spark):
    # absent at snap 1, changed when re-observed: boundary lands at the
    # RE-OBSERVATION snap (2) — intervals still tile exclusively
    got = _hist(spark, [("u", 0, "x"), ("u", 2, "y"), ("u", 3, "y")])
    assert got == [
        ("u", 1, 0, 2, 0, 1, 0),
        ("u", 2, 2, None, 3, 2, 1),
    ]


def test_whitespace_change_is_not_a_version(spark):
    # fingerprints normalize whitespace/case, so cosmetic edits don't
    # open versions (same contract as snapshot_diff)
    got = _hist(spark, [("u", 0, "Hello  world"), ("u", 1, "hello world")])
    assert got == [("u", 1, 0, None, 1, 2, 1)]


def test_intervals_tile_per_key(spark):
    rows = [("k", s, "v" + str(s // 2)) for s in range(6)]
    got = _hist(spark, rows)
    # consecutive valid_to == next valid_from; exactly one current
    spans = [(g[2], g[3]) for g in got]
    assert spans == [(0, 2), (2, 4), (4, None)]
    assert sum(g[6] for g in got) == 1
