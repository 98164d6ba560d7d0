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


def test_comment_and_string_hazards():
    # parens inside a -- comment must not corrupt depth tracking
    out = count_only_sql(
        "SELECT a FROM t -- bogus ( comment\nORDER BY a")
    assert out.rstrip(")").rstrip().upper().endswith("COMMENT") or \
        "ORDER BY a" not in out.split("-- bogus")[-1]
    # keyword-looking text inside a string literal must be ignored
    out2 = count_only_sql(
        "SELECT a, 'ORDER BY fake' AS lbl FROM t ORDER BY a")
    assert "'ORDER BY fake'" in out2
    assert out2.count("ORDER BY") == 1  # only the literal survives
    # an identifier containing LIMIT must not truncate mid-token
    out3 = count_only_sql("SELECT a FROM t ORDER BY a, limit_x")
    assert "limit_x" not in out3 and "LIMIT" not in out3.upper()
    # a string with an unbalanced paren before the ORDER BY
    out4 = count_only_sql("SELECT ')(' AS j, a FROM t ORDER BY a")
    assert "ORDER BY" not in out4.replace("')('", "")


def test_registry_oracles_scan_clean():
    """Every registry oracle's COUNT wrapper must still PLAN in DuckDB
    (r9 advice: the lexer hazards were invisible because no current
    oracle tripped them — this pins that the rowcap path stays valid
    as queries are added; EXPLAIN binds + plans without executing)."""
    from shredder_spark import queries as queries_mod
    from tests.oracle_utils import duckdb_connect

    reg = queries_mod.registry()
    con = duckdb_connect("/root/testdata/sf0.001")
    bad = []
    try:
        for name in sorted(reg):
            q = reg[name]
            if q.oracle is None:
                continue
            try:
                con.execute("EXPLAIN " + count_only_sql(q.oracle))
            except Exception as e:  # noqa: BLE001
                bad.append(f"{name}: {str(e)[:120]}")
    finally:
        con.close()
    assert not bad, bad


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
