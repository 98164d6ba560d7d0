"""Z-order layout: Morton-curve clustering must shrink per-file
2-D bounding boxes (the statistic min/max file pruning reads)."""

from __future__ import annotations

import pyspark.sql.functions as F

from shredder_spark.operators.zorder import interleave_bits, write_zordered


def _mk_points(spark, n=4096):
    # two independent uniform dims derived from the id
    return (spark.range(n)
            .withColumn("x", (F.col("id") * 7919 % 4096).cast("long"))
            .withColumn("y", (F.col("id") * 104729 % 4096).cast("long")))


def test_interleave_bits_golden(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 5)], "a long, b long"
    ).select(interleave_bits(F.col("a"), F.col("b"), 4).alias("z")).collect()
    # morton(a,b) with a on even bits: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    # (2,2)=12 (3,5)=39
    assert [r.z for r in rows] == [0, 1, 2, 3, 12, 39]


def _bbox_area_sum(df, part_col):
    per = (df.groupBy(part_col)
           .agg((F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy")))
    return (per.select(F.sum(F.col("dx") * F.col("dy")).alias("s"))
            .collect()[0].s)


def test_zorder_shrinks_partition_bboxes(spark, tmp_path):
    pts = _mk_points(spark)
    zpath = str(tmp_path / "z")
    write_zordered(pts, zpath, "x", "y", n_files=16, bits=12)

    zread = (spark.read.parquet(zpath)
             .withColumn("f", F.expr("input_file_name()")))
    n_files = zread.select("f").distinct().count()
    assert n_files >= 8  # range partitioning actually spread the data

    z_area = _bbox_area_sum(zread, "f")
    # control: the same points split round-robin (no locality)
    rand = pts.repartition(16).withColumn(
        "f", F.expr("spark_partition_id()"))
    r_area = _bbox_area_sum(rand, "f")
    # Morton clustering: each file's 2-D bbox is a curve segment;
    # total bbox area must be far below the unclustered layout's
    # (which has every partition spanning ~the full square)
    assert z_area < 0.35 * r_area, (z_area, r_area)


def test_zorder_file_pruning_effect(spark, tmp_path):
    """The operational consequence: a selective 2-D box filter touches
    a small fraction of z-ordered files (via their min/max spans)."""
    pts = _mk_points(spark)
    zpath = str(tmp_path / "zp")
    write_zordered(pts, zpath, "x", "y", n_files=16, bits=12)
    zread = (spark.read.parquet(zpath)
             .withColumn("f", F.expr("input_file_name()")))
    total = zread.select("f").distinct().count()
    box = zread.filter((F.col("x") < 256) & (F.col("y") < 256))
    touched = box.select("f").distinct().count()
    # a 1/256-area query box should live in a handful of curve segments
    assert touched <= max(2, total // 4), (touched, total)


def test_zorder_over_32k_rows_no_overflow(spark):
    """Regression: rank * 2^16 must use long arithmetic — with 32-bit
    math any input over 32,767 rows overflows (ANSI error or negative
    z-codes). 40k rows at the default bits=16 exercises that range."""
    from shredder_spark.operators.zorder import z_value

    pts = _mk_points(spark, n=40_000)
    z = z_value(pts, "x", "y")  # default bits=16
    stats = z.agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"),
                  F.count("*").alias("n")).collect()[0]
    assert stats.n == 40_000
    assert stats.lo >= 0
    assert stats.hi < (1 << 32)
