"""Batch sessionization: gaps-and-islands as a reusable operator.

The same semantics as the streaming ``session_window`` (B57) for
batch/backfill jobs: events more than ``gap`` apart start a new
session per key. One hash shuffle on the key + two windowed passes
over each partition (lag → cumulative sum) — the classic formulation,
no Python in the row path. Oracle: the portable SQL in Q46.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign session ids: columns ``key, sid (1-based per key), s_start,
    s_end, n`` — one row per session."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}"))
    ).cast("long")
    run = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    with_sid = df.select(key, ts_col).withColumn(
        "sid", F.sum(new_session).over(run))
    return (
        with_sid.groupBy(key, "sid")
        .agg(F.min(ts_col).alias("s_start"), F.max(ts_col).alias("s_end"),
             F.count("*").alias("n"))
        .orderBy(key, "sid")
    )
