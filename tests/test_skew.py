"""Skew utilities: salted join / two-phase agg equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from shredder_spark.operators.skew import salted_join, two_phase_agg

SF = "/root/testdata/sf0.001"


def _skewed(spark):
    # 90% of rows share key 1 (the hot key)
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 3).alias("v"),
    )


def test_salted_inner_join_equivalence(spark):
    probe = _skewed(spark)
    build = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("w"))
    plain = probe.join(build, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")).first()
    salted = salted_join(probe, build, "k", salt_n=8).groupBy().agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")).first()
    assert tuple(plain) == tuple(salted)


def test_salted_left_join_equivalence(spark):
    probe = _skewed(spark)
    build = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = probe.join(build, "k", "left")
    salted = salted_join(probe, build, "k", salt_n=4, how="left")
    assert plain.count() == salted.count()
    assert (plain.filter("w IS NULL").count()
            == salted.filter("w IS NULL").count())


def test_two_phase_agg_equivalence(spark):
    df = _skewed(spark)
    plain = {r.k: (r.n, r.s, r.mn, r.mx) for r in df.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    twop = {r.k: (r.count_v, r.sum_v2, r.min_v3, r.max_v4) for r in two_phase_agg(
        df.select("k", "v", F.col("v").alias("v2"), F.col("v").alias("v3"),
                  F.col("v").alias("v4")),
        ["k"], {"v": "count", "v2": "sum", "v3": "min", "v4": "max"},
        salt_n=8).collect()}
    assert plain == twop
