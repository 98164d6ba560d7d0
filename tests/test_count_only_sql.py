"""count_only_sql: the rowcap path's COUNT wrapper (round-9 fix).

DuckDB materializes a subquery sort under COUNT(*) — q08's
25-value-key full join at sf10 is ~6e9 rows (~270 GB), which
OOM-killed a sweep shard. Ordering never changes a COUNT, so the
top-level ORDER BY is stripped; a LIMIT/OFFSET after it (which DOES
change the count) and any nested ORDER BY (window frames, subqueries)
must survive.
"""

from __future__ import annotations

import duckdb

from tests.oracle_utils import count_only_sql


def test_strips_top_level_order_by():
    out = count_only_sql("SELECT a FROM t ORDER BY a NULLS LAST, b DESC")
    assert "ORDER BY" not in out
    assert out.startswith("SELECT COUNT(*) FROM (")


def test_keeps_window_and_subquery_order_by():
    out = count_only_sql(
        "SELECT a, RANK() OVER (ORDER BY x) AS r FROM t ORDER BY a")
    assert out.count("ORDER BY") == 1 and "OVER (ORDER BY x)" in out
    out2 = count_only_sql(
        "SELECT a FROM (SELECT a FROM t ORDER BY a LIMIT 3) s")
    assert "ORDER BY a LIMIT 3" in out2


def test_keeps_limit_after_stripped_order_by():
    out = count_only_sql("SELECT a FROM t ORDER BY a LIMIT 5 OFFSET 2")
    assert "ORDER BY" not in out and "LIMIT 5 OFFSET 2" in out


def test_counts_match_duckdb():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS a, range % 7 AS b "
                "FROM range(1000)")
    cases = [
        "SELECT a FROM t ORDER BY a DESC",
        "SELECT a FROM t WHERE b > 2 ORDER BY b, a LIMIT 37",
        "SELECT b, COUNT(*) AS c FROM t GROUP BY b ORDER BY c",
        "SELECT a, SUM(a) OVER (ORDER BY a) AS s FROM t ORDER BY s",
    ]
    for q in cases:
        want = con.execute(f"SELECT COUNT(*) FROM ({q})").fetchone()[0]
        got = con.execute(count_only_sql(q)).fetchone()[0]
        assert got == want, q
