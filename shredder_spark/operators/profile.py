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


def groupwise_zscore(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (B50's UDAF/grouped-map
    flavor): each group's Arrow batch is normalized in pandas. SQL
    window functions express this exact semantics too (the oracle,
    Q105) — the pandas path exists for transforms SQL can't write
    (sklearn scalers, per-group model scoring); keys hash-shuffle once,
    same as the window plan."""
    import pandas as pd

    from shredder_spark.utils import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    out_schema = f"{key} long, {value_col} double, z double"

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd == sd else v * float("nan")
        return pd.DataFrame({key: pdf[key], value_col: v, "z": z})

    return df.select(key, value_col).groupBy(key).applyInPandas(_norm, out_schema)


def check_constraints(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Declarative data-quality checks in ONE pass (deequ-style lite):
    ``rules`` maps rule name → boolean Column; output is one row per
    rule with n_rows, n_violations, pass_rate — all computed in a
    single aggregation job regardless of rule count."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for name, cond in rules.items():
        aggs.append(F.sum((~cond).cast("long")).alias(f"_viol_{name}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_viol_{name}").alias("n_violations"),
            F.round((F.col("_rows") - F.col(f"_viol_{name}"))
                    / F.col("_rows"), 4).alias("pass_rate"),
        )
        for name in rules
    ]
    return (wide.select(F.explode(F.array(*structs)).alias("c"))
            .select("c.*").orderBy("rule"))
