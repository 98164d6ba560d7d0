"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the declared operator surface (SURVEY.md §2)
for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from shredder_spark import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    q = _queries.registry()["q15_pricing_summary"]
    return q.run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _make(q: _queries.Query) -> Callable[[SparkSession, str], DataFrame]:
        def _run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return q.run(spark, sf_dir)

        _run.__name__ = q.name
        return _run

    return {name: _make(q) for name, q in _queries.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle
        for name, q in _queries.registry().items()
        if q.oracle is not None
    }
