"""Scale-safe global-window tier (operators/scale_windows.py).

Two properties, per the round-3 verdict:
1. EXACT equivalence — the two-phase operators reproduce the global
   window results bit-for-bit (primitive level), and the five scale-
   tier query builders reproduce their declared registry queries'
   output at the test SF.
2. PLAN — no unpartitioned Window node anywhere in any scale-tier
   plan (the declared texts DO have one; the guard must trip there).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from shredder_spark import queries as q
from shredder_spark.operators import scale_windows as sw

SF_DIR = os.environ.get("SHREDDER_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ties_df(spark, n=1000, mod=97):
    # mod << n forces heavy ties on the leading key — the hard case for
    # range bucketing (tied boundary values must stay in one bucket)
    return (spark.range(n)
            .withColumn("v", (F.col("id") * 7919 % mod).cast("double")))


def test_global_rank_matches_window(spark):
    df = _ties_df(spark)
    want = df.withColumn("rk", F.row_number().over(Window.orderBy("v", "id")))
    got = sw.with_global_rank(df, [("v", "asc"), ("id", "asc")],
                              out_col="rk", buckets=8)
    assert ({(r.id, r.rk) for r in got.collect()}
            == {(r.id, r.rk) for r in want.collect()})
    sw.assert_no_unpartitioned_window(got)


def test_global_ntile_matches_window_desc_and_small(spark):
    df = _ties_df(spark)
    want = df.withColumn(
        "t", F.ntile(7).over(Window.orderBy(F.col("v").desc(), F.col("id"))))
    got = sw.with_global_ntile(df, [("v", "desc"), ("id", "asc")], 7,
                               out_col="t", buckets=8)
    assert ({(r.id, r.t) for r in got.collect()}
            == {(r.id, r.t) for r in want.collect()})
    sw.assert_no_unpartitioned_window(got)

    small = df.limit(5)  # cnt < n: NTILE gives one row per tile
    want = small.withColumn("t", F.ntile(10).over(Window.orderBy("v", "id")))
    got = sw.with_global_ntile(small, [("v", "asc"), ("id", "asc")], 10,
                               out_col="t", buckets=4)
    assert ({(r.id, r.t) for r in got.collect()}
            == {(r.id, r.t) for r in want.collect()})


def test_global_running_sum_matches_window(spark):
    df = _ties_df(spark)
    want = df.withColumn(
        "s", F.sum("v").over(Window.orderBy("v", "id")
                             .rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)))
    got = sw.with_global_running_sum(df, [("v", "asc"), ("id", "asc")],
                                     F.col("v"), out_col="s", buckets=8)
    assert ({(r.id, round(r.s, 6)) for r in got.collect()}
            == {(r.id, round(r.s, 6)) for r in want.collect()})
    sw.assert_no_unpartitioned_window(got)


def test_plan_guard_trips_on_global_window(spark):
    df = _ties_df(spark)
    naive = df.withColumn("rk", F.row_number().over(Window.orderBy("v")))
    with pytest.raises(AssertionError, match="unpartitioned window"):
        sw.assert_no_unpartitioned_window(naive)


SCALE_TIERS = {
    "q149_decile_stats": sw.q149_scale,
    "q243_token_budget_prefix": sw.q243_scale,
    "q288_rfm_quintiles": sw.q288_scale,
    "q313_quantile_normalization": sw.q313_scale,
    "q343_cumulative_gains": sw.q343_scale,
}


def _norm(rows):
    out = set()
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, 4))
            else:
                vals.append(v)
        out.add(tuple(vals))
    return out


@pytest.mark.parametrize("name", sorted(SCALE_TIERS))
def test_scale_tier_equals_declared_query(spark, name):
    declared = q.registry()[name].run(spark, SF_DIR)
    scale = SCALE_TIERS[name](spark, SF_DIR)
    assert scale.columns == declared.columns
    assert _norm(scale.collect()) == _norm(declared.collect())


@pytest.mark.parametrize("name", sorted(SCALE_TIERS))
def test_scale_tier_plan_has_no_unpartitioned_window(spark, name):
    sw.assert_no_unpartitioned_window(SCALE_TIERS[name](spark, SF_DIR))


def _grouped_ties_df(spark, n=3000):
    # 3-value group key (the q21 shape) + heavy order-key ties so
    # rank/dense_rank genuinely diverge from row_number, and ties
    # straddle would-be bucket boundaries.
    return (spark.range(n)
            .withColumn("g", (F.col("id") % 3).cast("string"))
            .withColumn("v", (F.col("id") * 7919 % 41).cast("double")))


def test_grouped_ranks_match_window(spark):
    df = _grouped_ties_df(spark)
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    want = (df.withColumn("rn", F.row_number().over(w))
            .withColumn("rk", F.rank().over(w))
            .withColumn("drk", F.dense_rank().over(w))
            .withColumn("nt", F.ntile(7).over(w)))
    got = sw.with_grouped_ranks(
        df, ["g"], [("v", "desc"), ("id", "asc")],
        row_number_col="rn", rank_col="rk", dense_rank_col="drk",
        ntile=(7, "nt"), buckets=8)
    assert ({(r.id, r.rn, r.rk, r.drk, r.nt) for r in got.collect()}
            == {(r.id, r.rn, r.rk, r.drk, r.nt) for r in want.collect()})
    sw.assert_no_low_cardinality_window(got)


def test_grouped_ranks_tiny_groups(spark):
    # groups smaller than the tile count (q == 0 branch) and a group
    # with a single row
    df = (spark.range(9)
          .withColumn("g", F.when(F.col("id") < 1, "solo")
                      .otherwise((F.col("id") % 2).cast("string")))
          .withColumn("v", F.col("id").cast("double")))
    w = Window.partitionBy("g").orderBy("v")
    want = df.withColumn("nt", F.ntile(5).over(w))
    got = sw.with_grouped_ranks(df, ["g"], [("v", "asc")],
                                ntile=(5, "nt"), buckets=4)
    assert ({(r.id, r.nt) for r in got.collect()}
            == {(r.id, r.nt) for r in want.collect()})


def test_grouped_ranks_boolean_and_float_group_keys(spark):
    # Python str() and Spark CAST(… AS STRING) render booleans (True
    # vs true) and small floats differently; the offset lookup must
    # use Spark's rendering end-to-end or it silently falls back to
    # offset 0 and mis-ranks every row past bucket 0.
    df = (spark.range(400)
          .withColumn("gb", (F.col("id") % 2 == 0))
          .withColumn("gf", (F.col("id") % 3).cast("double") / 100000.0)
          .withColumn("v", (F.col("id") * 7919 % 97).cast("double")))
    w = Window.partitionBy("gb", "gf").orderBy("v", "id")
    want = df.withColumn("rn", F.row_number().over(w))
    got = sw.with_grouped_ranks(df, ["gb", "gf"],
                                [("v", "asc"), ("id", "asc")],
                                row_number_col="rn", buckets=8)
    assert ({(r.id, r.rn) for r in got.collect()}
            == {(r.id, r.rn) for r in want.collect()})


def test_low_cardinality_guard_trips_on_declared_q21(spark):
    df = _grouped_ties_df(spark)
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    plain = df.withColumn("rn", F.row_number().over(w))
    with pytest.raises(AssertionError):
        sw.assert_no_low_cardinality_window(plain)


def test_q421_scale_tier_matches_q21(spark):
    from tests.oracle_utils import compare_query
    query = q.registry()["q421_grouped_rank_scale"]
    problems = compare_query(spark, SF_DIR, query)
    assert not problems, "; ".join(problems)
    sw.assert_no_low_cardinality_window(query.run(spark, SF_DIR))


def test_global_rank_and_running_sum_combined(spark):
    # the one-pass combined primitive must agree with both globals
    df = _ties_df(spark)
    w = Window.orderBy("v", "id")
    want = (df.withColumn("rk", F.row_number().over(w))
            .withColumn("s", F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))))
    got = sw.with_global_rank_and_running_sum(
        df, [("v", "asc"), ("id", "asc")], F.col("v"),
        rank_col="rk", sum_col="s", buckets=8)
    assert ({(r.id, r.rk, round(r.s, 6)) for r in got.collect()}
            == {(r.id, r.rk, round(r.s, 6)) for r in want.collect()})
    sw.assert_no_unpartitioned_window(got)


def test_exact_percentiles_matches_spark_percentile(spark):
    """exact_percentiles == Spark's exact PERCENTILE bit-for-bit
    (same (n-1)p interpolation), without the single-reduce
    value→count map (r10: PERCENTILE over near-continuous fact
    columns was 801 s at sf100 — q151/q250/q450/q107 now route
    through this tier / a partitioned rank window)."""
    import pyspark.sql.functions as F

    from shredder_spark.operators.scale_windows import exact_percentiles

    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    ps = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    mine = exact_percentiles(df, "l_extendedprice", ps, buckets=8)
    arr = ",".join(f"{p}D" for p in ps)
    ref = df.agg(F.expr(
        f"percentile(l_extendedprice, array({arr}))")).collect()[0][0]
    assert mine == list(ref)
    # duplicate-heavy column: ties at the bracketing ranks
    mine_q = exact_percentiles(df, "l_quantity", [0.5, 0.77], buckets=8)
    ref_q = df.agg(F.expr(
        "percentile(l_quantity, array(0.5D, 0.77D))")).collect()[0][0]
    assert mine_q == list(ref_q)
    # empty input
    assert exact_percentiles(df.filter("l_quantity > 1e9"),
                             "l_quantity", [0.5]) == [None]
