"""Local mirror of the driver's DuckDB-oracle compare.

Runs the engine query on Spark and the oracle SQL on DuckDB over the
same parquet tables and compares canonicalized row sets (order-
insensitive, column-name-sorted — same shape the driver hashes).
Floats compare with a small tolerance pre-round so local runs don't
flake on binary .xx5 boundaries.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from shredder_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows_canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(columns), [tuple(_canon(r[i]) for i in order) for r in rows]


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare_query(spark, sf_dir: str, query) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    engine_df = query.run(spark, sf_dir)
    engine_cols = engine_df.columns
    engine_rows = [tuple(r) for r in engine_df.collect()]

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(query.oracle)
        oracle_cols = [d[0] for d in res.description]
        oracle_rows = res.fetchall()
    finally:
        con.close()

    problems: list[str] = []
    ec, er = _rows_canon(engine_cols, engine_rows)
    oc, orows = _rows_canon(oracle_cols, oracle_rows)
    if ec != oc:
        problems.append(f"columns differ: engine={ec} oracle={oc}")
        return problems
    if len(er) == 0:
        problems.append("empty result on both sides — query can't verify anything"
                        if len(orows) == 0 else f"engine empty, oracle {len(orows)} rows")
    if len(er) != len(orows):
        problems.append(f"row count differs: engine={len(er)} oracle={len(orows)}")
        return problems
    # order-insensitive: sort canonicalized rows on repr
    er_s = sorted(er, key=repr)
    or_s = sorted(orows, key=repr)
    bad = 0
    for i, (a, b) in enumerate(zip(er_s, or_s)):
        if not all(_values_equal(x, y) for x, y in zip(a, b)):
            bad += 1
            if bad <= 3:
                problems.append(f"row mismatch at sorted idx {i}: engine={a} oracle={b}")
    if bad > 3:
        problems.append(f"... {bad} mismatched rows total")
    return problems
