"""Table catalog over the driver-generated parquet test data.

``register_views`` exposes each parquet table as a temp view so both
the SQL and DataFrame paths share one catalog. Views over parquet keep
Catalyst free to push filters/column pruning into the scan — at 100 TB
these are partition-pruned, column-pruned parquet reads, never
materialized loads.
"""

from __future__ import annotations

import functools
import os

import pyarrow.parquet as _pq
import pyarrow as _pa

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@functools.lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — illegal for Spark's
    vectorized reader, so we read them as raw nanos longs and convert."""
    schema = _pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if _pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        # Read TIMESTAMP(NANOS) as epoch-nanos longs, then rebuild proper
        # timestamps. Integer DIV keeps the math exact (nanos ~1e18
        # exceed double's 2^53 mantissa) and entirely JVM-side.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


# The sf_dir most recently passed to register_views — lets query
# builders that need the raw file scan (e.g. _metadata provenance,
# which temp views cannot expose) re-open the same tables.
CURRENT_SF_DIR = DEFAULT_SF_DIR


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view named after itself."""
    global CURRENT_SF_DIR
    CURRENT_SF_DIR = sf_dir
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
