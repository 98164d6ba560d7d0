"""Plan-shape regression tests: pin the SCALE.md claims.

Small-SF value tests can't catch a lost pushdown or a de-broadcast —
these assertions can.
"""

from __future__ import annotations

import pytest

from shredder_spark import queries as Q
from shredder_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return Q.registry()


def _run(spark, reg, name):
    return reg[name].run(spark, SF)


def test_q15_filter_pushed_and_columns_pruned(spark, reg):
    df = _run(spark, reg, "q15_pricing_summary")
    P.assert_pushed_filter(df, "lineitem", "LessThanOrEqual(l_shipdate")
    cols = P.read_columns(df, "lineitem")
    assert "l_comment" not in cols and "l_partkey" not in cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q13_dim_broadcast(spark, reg):
    df = _run(spark, reg, "q13_broadcast_join")
    assert "BroadcastHashJoin" in P.join_strategies(df)


def test_q25_topk_no_global_sort(spark, reg):
    P.assert_top_k(_run(spark, reg, "q25_topk"))


def test_q43_topk_and_scan_pruning(spark, reg):
    df = _run(spark, reg, "q43_cosine_topk")
    P.assert_top_k(df)
    P.assert_no_cartesian(df)


def test_q84_no_cartesian_in_sixway_join(spark, reg):
    df = _run(spark, reg, "q84_local_supplier_volume")
    P.assert_no_cartesian(df)
    P.assert_pushed_filter(df, "region", "EqualTo(r_name,ASIA)")


def test_q76_asof_shuffle_only(spark, reg):
    df = _run(spark, reg, "q76_asof_union_trick")
    assert P.join_strategies(df) == []  # no join at all: union + window
