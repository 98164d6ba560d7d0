"""Z-order (Morton-curve) data layout for multi-dimensional locality.

A table range-partitioned on ONE column prunes scans on that column
only; interleaving the bits of two (rank-normalized) key columns into
a Morton code and range-partitioning on THAT gives every partition a
small bounding box in BOTH dimensions — so min/max file statistics
prune selective filters on either column (the technique behind
Delta/Iceberg Z-ORDER clustering, here as plain Catalyst expressions +
repartitionByRange; no table format required).

All JVM-side: rank normalization is two window functions, the bit
interleave is shift/mask expressions inside codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints (< 2^bits each): bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def z_value(df: DataFrame, col_a: str, col_b: str, *,
            bits: int = 16, out_col: str = "_z") -> DataFrame:
    """Attach a Morton code over the RANK-normalized pair — rank
    normalization (dense percent scale to 2^bits buckets) makes the
    curve robust to skewed/non-integer distributions, same as engine
    Z-ORDER implementations."""
    n = 1 << bits

    def norm(c: str) -> Column:
        # long arithmetic: row_number() is IntegerType, and rk * n
        # overflows 32 bits past 32,767 rows at the default bits=16
        rk = (F.row_number().over(Window.orderBy(F.col(c))) - 1).cast("long")
        cnt = F.count("*").over(Window.partitionBy())
        return ((rk * F.lit(n).cast("long")) / cnt).cast("long")

    # note: the global-window rank is the honest spec; for very large
    # tables substitute an approxQuantile-based bucketizer (sampled
    # driver-side) to avoid the single-partition rank — the z-code
    # consumer is unchanged
    return df.withColumn(
        out_col,
        interleave_bits(norm(col_a), norm(col_b), bits))


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str, *,
                   n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` clustered along the Morton curve: range-partition on
    the z-code (each output file covers a contiguous curve segment = a
    small 2-D bounding box), sort within partitions, drop the helper."""
    (z_value(df, col_a, col_b, bits=bits)
     .repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))
