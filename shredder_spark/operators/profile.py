"""One-pass table profiling: per-column stats for data quality checks.

All columns' metrics compute in a SINGLE aggregation pass (one job, no
shuffle beyond the global agg tree-reduce) — the pattern matters at
100 TB where "profile the table" must not mean one job per column.
Output is long-form (one row per column) so downstream checks can
join/filter on it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: rows, nulls, distinct (exact), min/max
    (numeric columns, as doubles; null otherwise). One aggregation
    pass; long-form output (col_name, n_rows, n_nulls, n_distinct,
    mn, mx) ordered by col_name."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if isinstance(df.schema[c].dataType, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)

    structs = []
    for c in cols:
        numeric = isinstance(df.schema[c].dataType, NumericType)
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.round(F.col(f"_mn_{c}"), 2) if numeric
             else F.lit(None).cast("double")).alias("mn"),
            (F.round(F.col(f"_mx_{c}"), 2) if numeric
             else F.lit(None).cast("double")).alias("mx"),
        ))
    return (wide.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*").orderBy("col_name"))
