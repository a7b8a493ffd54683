"""Declared query registry — consumed by ``__spark_entry__.py``.

Each entry maps a name to a :class:`Query` with a Spark builder
``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) an equivalent
DuckDB oracle SQL string over the driver's pre-registered parquet views.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def registry() -> dict[str, Query]:
    from . import dataprep, relational, scalar, textops, trace

    out: dict[str, Query] = {}
    for mod in (trace, relational, textops, dataprep, scalar):
        out.update(mod.QUERIES)
    return out
