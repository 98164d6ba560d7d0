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


def test_theta_sketch_set_algebra_accuracy(spark):
    """Theta sketches close under union/intersection/difference; at this
    cardinality the estimates are exact. Pins q297's rows-only tier."""
    from shredder_spark import queries as Q

    row = Q.registry()["q297_theta_sketch_algebra"].run(spark, SF).collect()[0]
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    n_cust = cust.select("c_custkey").distinct().count()
    with_orders = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                             "left_semi").count())
    assert abs(row.est_union - n_cust) / n_cust < 0.03
    assert abs(row.est_both - with_orders) / with_orders < 0.05
    assert abs(row.est_no_orders - (n_cust - with_orders)) <= \
        max(5, 0.1 * (n_cust - with_orders))


def test_kll_sketch_rank_error_bound(spark):
    """KLL quantile estimates sit within rank-error of the exact
    percentiles: the p50 estimate must lie between the exact p48 and
    p52 values (default k's normalized rank error ~1.65%)."""
    from shredder_spark import queries as Q

    row = Q.registry()["q298_kll_quantile_sketch"].run(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    lo, mid, hi = li.selectExpr(
        "percentile(l_extendedprice, 0.48) AS lo",
        "percentile(l_extendedprice, 0.95) AS mid95",
        "percentile(l_extendedprice, 0.52) AS hi").collect()[0]
    assert lo <= row.p50_est <= hi
    assert row.n == li.count()
    p93, p97 = li.selectExpr(
        "percentile(l_extendedprice, 0.93)",
        "percentile(l_extendedprice, 0.97)").collect()[0]
    assert p93 <= row.p95_est <= p97


def test_aes_roundtrip_and_determinism(spark):
    """aes_encrypt/decrypt round-trip; ECB mode is deterministic (same
    key+plaintext → same ciphertext), GCM mode salts (differs)."""
    df = spark.sql("""
        SELECT CAST(aes_decrypt(aes_encrypt('payload-7', k, 'ECB'),
                                k, 'ECB') AS STRING) AS rt,
               aes_encrypt('payload-7', k, 'ECB') AS c1,
               aes_encrypt('payload-7', k, 'ECB') AS c2
        FROM (SELECT '0123456789abcdef' AS k)""").collect()[0]
    assert df.rt == "payload-7"
    assert bytes(df.c1) == bytes(df.c2)


def test_utf8_validation_family(spark):
    """is_valid_utf8 / make_valid_utf8 / try_validate_utf8 — raw-bytes
    hygiene for ingest paths that can't trust their input encoding."""
    rows = spark.sql(r"""
        SELECT is_valid_utf8(CAST(good AS STRING)) AS ok_good,
               is_valid_utf8(CAST(bad AS STRING)) AS ok_bad,
               try_validate_utf8(CAST(bad AS STRING)) IS NULL AS bad_nulls,
               make_valid_utf8(CAST(bad AS STRING)) IS NOT NULL AS repaired
        FROM (SELECT encode('plain', 'UTF-8') AS good,
                     X'C3' AS bad)""").collect()[0]
    assert rows.ok_good and not rows.ok_bad
    assert rows.bad_nulls and rows.repaired


def test_id_generation_invariants(spark):
    """monotonically_increasing_id: distinct across rows, ordered within
    a partition (the partition-id lives in the high bits); uuid():
    distinct and well-formed."""
    import re

    df = (load_table(spark, SF, "orders").repartition(4)
          .withColumn("mid", F.expr("monotonically_increasing_id()"))
          .withColumn("pid", F.expr("spark_partition_id()"))
          .withColumn("u", F.expr("uuid()")))
    n = df.count()
    got = df.select("mid", "pid", "u").collect()
    assert len({r.mid for r in got}) == n
    assert len({r.u for r in got}) == n
    assert all(re.fullmatch(r"[0-9a-f-]{36}", r.u) for r in got)
    assert all((r.mid >> 33) == r.pid for r in got)


def test_geospatial_st_wkb_roundtrip(spark):
    """ST geometry surface (gated behind spark.sql.geospatial.enabled):
    WKB parse → binary round-trip is the identity, and SRID get/set
    behave. Spark-side only — the oracle engine has no geo extension
    in this container, so the distance-join tier (q319) uses pure
    haversine math instead of ST types."""
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    try:
        row = spark.sql("""
            SELECT hex(st_asbinary(st_geomfromwkb(wkb))) AS rt,
                   st_srid(st_setsrid(st_geomfromwkb(wkb), 4326)) AS srid
            FROM (SELECT X'0101000000000000000000F03F0000000000000040'
                  AS wkb)""").collect()[0]
        assert row.rt == "0101000000000000000000F03F0000000000000040"
        assert row.srid == 4326
    finally:
        spark.conf.unset("spark.sql.geospatial.enabled")
