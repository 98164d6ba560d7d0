"""Bucketed (co-located) joins: the shuffle-elimination lever for
repeatedly-joined fact tables.

A join between two tables bucketed by the join key into the same
bucket count needs NO exchange at query time — each task merge-joins
bucket i of both sides. At 100 TB, pre-bucketing the big fact tables
on their join keys turns every subsequent join/aggregate on that key
into a shuffle-free stage; the one-time bucketing write is amortized
across every downstream query. This is the managed-table flavor of
"repartition once, reuse the partitioning" (the other flavor —
`df.repartition(k)` reuse inside one job — Catalyst already handles
via Exchange reuse).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 32,
    *,
    sort: bool = True,
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a managed table bucketed (and bucket-sorted)
    by the join key. Sorting inside buckets lets the sort-merge join
    skip its sort as well — scan → merge-join directly."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session may have left the managed location behind
    # (fresh metastore, stale directory) — clear it or the write fails
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = (df.write.format(format).mode("overwrite")
              .bucketBy(n_buckets, *cols))
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs the
    physical plan contains no Exchange on either side (asserted in
    tests) — at scale this is the difference between a network shuffle
    of both tables and a purely local merge per bucket."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
