"""Scale-semantics pins: sketch mergeability and statistics-driven
planning — the two properties that make distributed aggregation and
join planning work at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from shredder_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_hll_sketches_merge_without_rescan(spark):
    """B118 extension: per-partition HLL sketches combine via
    hll_union_agg into the same estimate a direct global sketch gives —
    the mergeability that lets partial aggregates (or per-day rollup
    tables) answer global distinct-count questions with no rescan."""
    li = load_table(spark, SF, "lineitem")
    li.createOrReplaceTempView("li_hll")
    merged = spark.sql("""
        WITH per_flag AS (
          SELECT l_returnflag, hll_sketch_agg(l_orderkey) AS sk
          FROM li_hll GROUP BY l_returnflag)
        SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est FROM per_flag
    """).collect()[0].est
    direct = spark.sql(
        "SELECT hll_sketch_estimate(hll_sketch_agg(l_orderkey)) AS est "
        "FROM li_hll").collect()[0].est
    exact = li.select("l_orderkey").distinct().count()
    # merged and direct sketches may differ slightly (different insert
    # orders build different registers); both must sit within the HLL
    # error envelope of the exact count and of each other
    assert abs(merged - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05
    assert abs(merged - direct) / exact < 0.02


def test_analyze_table_feeds_cbo_stats(spark):
    """ANALYZE TABLE COMPUTE STATISTICS populates the row count the
    cost-based optimizer plans from (join reordering, broadcast
    decisions read these instead of raw file sizes)."""
    cust = load_table(spark, SF, "customer")
    cust.write.mode("overwrite").saveAsTable("cbo_customer")
    try:
        spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
        # catalog records the stats unconditionally...
        desc = {r.col_name: r.data_type for r in
                spark.sql("DESCRIBE TABLE EXTENDED cbo_customer").collect()}
        assert "Statistics" in desc and "rows" in desc["Statistics"]
        # ...and with CBO on they reach the optimizer's plan estimates
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = (spark.table("cbo_customer")._jdf.queryExecution()
                 .optimizedPlan().stats())
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == cust.count()
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.sql("DROP TABLE IF EXISTS cbo_customer")
