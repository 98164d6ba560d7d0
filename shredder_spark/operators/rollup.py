"""Hypertable-style time rollup: multi-granularity continuous
aggregates in ONE pass.

The timescale-style pattern — maintain hourly/daily/weekly aggregates
of an event stream — is a single GROUPING SETS aggregation over
multiple ``date_trunc`` granularities: one shuffle computes every
granularity (the Expand node fans rows out below the partial
aggregate, so the map-side combine still applies per grouping set).
At 100 TB this replaces N separate groupBy jobs with one, and the
result is partition-friendly (write partitioned by ``gran``).

Streaming variant: the same expression works under a watermark with
``window()`` buckets per granularity; batch recomputes converge to the
same answer (B55's equivalence argument).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_GRAN_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    *,
    granularities: Sequence[str] = ("hour", "day"),
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Multi-granularity rollup: one row per (granularity, bucket,
    *keys) with count (and sum/avg of ``value_col`` if given).

    Columns: gran, bucket, *keys, c [, s, a].
    """
    for g in granularities:
        if g not in _GRAN_ORDER:
            raise ValueError(f"unknown granularity {g!r}")
    gcols = {g: F.date_trunc(g, F.col(ts_col)).alias(f"_g_{g}")
             for g in granularities}
    base = df.select(*[F.col(k) for k in keys],
                     *(gcols[g] for g in granularities),
                     *( [F.col(value_col)] if value_col else [] ))

    sets = ", ".join(
        "(" + ", ".join([f"_g_{g}"] + list(keys)) + ")" for g in granularities
    )
    aggs = ["COUNT(*) AS c"]
    if value_col:
        aggs += [f"ROUND(SUM({value_col}), 2) AS s",
                 f"ROUND(AVG({value_col}), 2) AS a"]
    gran_case = " ".join(
        f"WHEN GROUPING(_g_{g}) = 0 THEN '{g}'" for g in granularities
    )
    bucket = "COALESCE(" + ", ".join(f"_g_{g}" for g in granularities) + ")"
    key_list = "".join(f", {k}" for k in keys)
    sql = f"""
      SELECT CASE {gran_case} END AS gran,
             {bucket} AS bucket{key_list},
             {", ".join(aggs)}
      FROM {{src}}
      GROUP BY GROUPING SETS ({sets})
      ORDER BY gran, bucket{key_list}
    """
    name = "_time_rollup_src"
    base.createOrReplaceTempView(name)
    return df.sparkSession.sql(sql.format(src=name))
