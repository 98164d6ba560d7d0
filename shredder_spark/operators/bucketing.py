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


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    *,
    granularity: str = "day",
    format: str = "parquet",
) -> None:
    """Write partitioned by a derived time bucket (`p_date=.../`) — the
    standard layout for event data at scale: queries filtering on the
    bucket prune whole directories at plan time (PartitionFilters in
    the scan, zero I/O for out-of-range partitions). Keep partition
    counts sane: day granularity → 365 dirs/year; don't partition by
    high-cardinality keys (that's what bucketing is for)."""
    import pyspark.sql.functions as F

    out = df.withColumn("p_bucket",
                        F.date_format(F.date_trunc(granularity, F.col(ts_col)),
                                      "yyyy-MM-dd"))
    out.write.format(format).mode("overwrite").partitionBy("p_bucket").save(path)


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
