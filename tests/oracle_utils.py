"""Local mimic of the driver's DuckDB-oracle comparison: run the Spark query
and the oracle SQL on the same parquet tables, sort columns by name, sort
rows, and compare values exactly."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "tolist"):  # numpy array / scalar
        v = v.tolist()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows, key=repr)


def assert_match(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(run_oracle(oracle_sql, sf_dir))
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name}: row {i} mismatch\n spark : {g}\n oracle: {w}"
