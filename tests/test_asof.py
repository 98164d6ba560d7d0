"""As-of join operator (union+window scale path)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from shredder_spark import queries as Q
from shredder_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def test_asof_matches_range_join_formulation(spark):
    reg = Q.registry()
    a = reg["q14_asof_join"].run(spark, SF).collect()
    b = reg["q76_asof_union_trick"].run(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert any(r.last_signup_ts is not None for r in b)


def test_asof_single_source_matches_two_scan(spark):
    """r12: the single-scan specialization builds the identical union
    frame from one conditional projection — row equality vs the
    generic two-scan asof_join on the q76 shape."""
    from shredder_spark.operators.asof import asof_join_single_source

    events = spark.read.parquet(f"{SF}/events.parquet")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("last_signup_ts"))
    two = asof_join(purchases, signups, "user_id", left_ts="ts",
                    right_ts="last_signup_ts",
                    right_cols=["last_signup_ts"]) \
        .select("event_id", "last_signup_ts").orderBy("event_id")
    one = asof_join_single_source(
        events, "user_id", ts="ts",
        probe_pred=F.col("event_type") == "purchase",
        ref_pred=F.col("event_type") == "signup",
        probe_cols=["event_id", "user_id", "ts"],
        right_cols={"last_signup_ts": F.col("ts")}) \
        .select("event_id", "last_signup_ts").orderBy("event_id")
    assert [tuple(r) for r in two.collect()] == \
        [tuple(r) for r in one.collect()]
    # one scan: exactly one relation in the optimized plan
    opt = one._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Relation") == 1


def test_asof_exact_match_modes(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, "k", t0), (2, "k", t0 + dt.timedelta(minutes=5))],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t0, 100), ("k", t0 + dt.timedelta(minutes=1), 200)],
        "k string, rts timestamp, v int")

    inclusive = asof_join(left, right, "k", left_ts="ts", right_ts="rts",
                          right_cols=["v"]).orderBy("id").collect()
    assert [r.v for r in inclusive] == [100, 200]

    strict = asof_join(left, right, "k", left_ts="ts", right_ts="rts",
                       right_cols=["v"], allow_exact_matches=False
                       ).orderBy("id").collect()
    assert [r.v for r in strict] == [None, 200]  # t0 row: no strictly-before


def test_asof_plan_is_single_shuffle(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    left = events.select("event_id", "user_id",
                         F.col("value").alias("lv"),
                         F.monotonically_increasing_id().alias("lts"))
    right = events.select("user_id", F.monotonically_increasing_id().alias("rts"),
                          F.col("value").alias("rv"))
    df = asof_join(left, right, "user_id", left_ts="lts", right_ts="rts",
                   right_cols=["rv"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
