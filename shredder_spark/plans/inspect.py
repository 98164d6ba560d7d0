"""Physical-plan inspection helpers.

The scale contract (SCALE.md) makes claims about plan *shapes* —
filters reach the parquet scan, dims broadcast, top-k never global-
sorts, nothing falls back to a cartesian product. These helpers turn
those claims into assertions so tests pin them (a regression that
un-pushes a filter or de-broadcasts a dim is a silent 100×-at-scale
bug that small-SF correctness tests cannot catch).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return qe.explainString(mode.fromString("formatted"))


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class ScanInfo:
    location: str
    pushed_filters: str
    read_schema: str


def scans(df: DataFrame) -> list[ScanInfo]:
    """Parquet scan nodes with their pushdown/pruning evidence."""
    plan = formatted_plan(df)
    out: list[ScanInfo] = []
    blocks = re.split(r"\(\d+\) Scan parquet ?", plan)[1:]
    for b in blocks:
        loc = re.search(r"Location: \S+ \[(.*?)\]", b)
        pf = re.search(r"PushedFilters: \[(.*?)\]", b)
        rs = re.search(r"ReadSchema: (\S+)", b)
        out.append(ScanInfo(
            location=loc.group(1) if loc else "",
            pushed_filters=pf.group(1) if pf else "",
            read_schema=rs.group(1) if rs else "",
        ))
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names, outermost-first."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        executed_plan(df))


def read_columns(df: DataFrame, table_substr: str) -> set[str]:
    """Columns actually read from scans whose location matches."""
    cols: set[str] = set()
    for s in scans(df):
        if table_substr in s.location:
            cols |= set(re.findall(r"(\w+):", s.read_schema))
    return cols


def assert_no_cartesian(df: DataFrame) -> None:
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies, strategies


def assert_pushed_filter(df: DataFrame, table_substr: str, fragment: str) -> None:
    """Assert some scan of the table has ``fragment`` in PushedFilters."""
    matching = [s for s in scans(df) if table_substr in s.location]
    assert matching, f"no scan matching {table_substr!r}"
    assert any(fragment in s.pushed_filters for s in matching), \
        [s.pushed_filters for s in matching]


def assert_top_k(df: DataFrame) -> None:
    """Assert the plan top-ks (TakeOrderedAndProject), not global-sorts."""
    assert "TakeOrderedAndProject" in executed_plan(df)
