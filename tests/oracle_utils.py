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
    # belt for the big-sf sweeps: cap the oracle's memory and give it
    # a spill dir so a materializing plan degrades to disk instead of
    # OOM-killing the whole sweep process (round-9 q08@sf10 finding)
    import os as _os
    con.execute("SET memory_limit='%s'"
                % _os.environ.get("ORACLE_DUCKDB_MEM", "24GB"))
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    # r11: bound the spill itself too — a q624-class oracle at sf100
    # spills >61 GB, which would fill the box's disk before failing.
    # With a cap the query raises a clean out-of-temp error instead,
    # which sweeps catch and record (and we disposition).
    con.execute("SET max_temp_directory_size='%s'"
                % _os.environ.get("ORACLE_DUCKDB_TMP_CAP", "40GB"))
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


# Above this many rows, the row-at-a-time Python compare dominates the
# sweep (collect + per-tuple canon on multi-million-row sf1 results ran
# ~100 s/query); the Arrow path compares the same values vectorized.
ARROW_COMPARE_THRESHOLD = 50_000


class _ArrowCompareUnsupported(Exception):
    """Raised when a result type has no vectorized canon — the caller
    falls back to the row-at-a-time compare."""


def _arrow_to_tuples(tbl) -> list[tuple]:
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    return list(zip(*cols)) if cols else []


def _canon_series(s):
    """Vectorized version of _canon for one pandas column."""
    import numpy as np
    import pandas as pd

    if pd.api.types.is_datetime64_any_dtype(s):
        if getattr(s.dt, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return s.astype("datetime64[us]"), "other"
    if pd.api.types.is_float_dtype(s):
        return s.astype(np.float64), "float"
    if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
        return s, "other"
    if s.dtype == object:
        head = s.dropna().head(3).tolist()
        if any(isinstance(v, Decimal) for v in head):
            return s.astype(np.float64), "float"
        if any(isinstance(v, (list, dict, tuple, np.ndarray)) for v in head):
            raise _ArrowCompareUnsupported(str(type(head[0])))
        if any(isinstance(v, (datetime.date, datetime.datetime)) for v in head):
            return s.map(_canon), "other"
        return s, "other"          # strings / bytes
    raise _ArrowCompareUnsupported(str(s.dtype))


def _compare_arrow(engine_cols, engine_tbl, oracle_cols, oracle_tbl) -> list[str]:
    """Order-insensitive vectorized compare of two Arrow tables with
    the same float tolerance as the row path."""
    import numpy as np

    problems: list[str] = []
    if sorted(engine_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: engine={sorted(engine_cols)} "
                        f"oracle={sorted(oracle_cols)}")
        return problems
    if engine_tbl.num_rows != oracle_tbl.num_rows:
        problems.append(f"row count differs: engine={engine_tbl.num_rows} "
                        f"oracle={oracle_tbl.num_rows}")
        return problems

    frames = []
    kinds: dict[str, str] = {}
    for tbl in (engine_tbl, oracle_tbl):
        pdf = tbl.to_pandas()
        canon = {}
        for c in sorted(pdf.columns):
            canon[c], kinds[c] = _canon_series(pdf[c])
        import pandas as pd
        cf = pd.DataFrame(canon)
        # sort on float columns ROUNDED to the compare tolerance so
        # binary-representation jitter can't reorder ties differently
        # on the two sides
        sort_cols = {}
        for c in cf.columns:
            sort_cols[c] = (cf[c].round(9) if kinds[c] == "float"
                            else cf[c])
        order = pd.DataFrame(sort_cols).sort_values(
            by=list(cf.columns), kind="mergesort",
            na_position="last").index
        frames.append(cf.loc[order].reset_index(drop=True))

    ef, of = frames
    bad_mask = np.zeros(len(ef), dtype=bool)
    for c in ef.columns:
        a, b = ef[c], of[c]
        if kinds[c] == "float":
            av, bv = a.to_numpy(np.float64), b.to_numpy(np.float64)
            col_bad = ~(np.isclose(av, bv, rtol=1e-9, atol=1e-9)
                        | (np.isnan(av) & np.isnan(bv)))
        else:
            col_bad = ~((a == b) | (a.isna() & b.isna())).to_numpy()
        bad_mask |= col_bad
    n_bad = int(bad_mask.sum())
    if n_bad:
        idx = np.flatnonzero(bad_mask)[:3]
        for i in idx:
            problems.append(
                f"row mismatch at sorted idx {i}: "
                f"engine={tuple(ef.iloc[i])} oracle={tuple(of.iloc[i])}")
        if n_bad > 3:
            problems.append(f"... {n_bad} mismatched rows total")
    return problems


def compare_query(spark, sf_dir: str, query) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    Small results (≤ ARROW_COMPARE_THRESHOLD rows on both sides) go
    through the original row-at-a-time tolerant compare. Larger
    results are materialized as Arrow tables on BOTH engines and
    compared vectorized (sorted frames, np.isclose on float columns)
    — same order-insensitivity and float tolerance, ~100× less Python
    per row, which is what makes a full-registry sweep at sf1
    tractable. Any Arrow conversion failure falls back to the row
    path."""
    engine_df = query.run(spark, sf_dir)
    engine_cols = engine_df.columns

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(query.oracle)
        oracle_cols = [d[0] for d in res.description]
        try:
            oracle_tbl = res.fetch_arrow_table()
            oracle_rows = None
        except Exception:
            oracle_tbl = None
            oracle_rows = res.fetchall()
    finally:
        con.close()

    engine_tbl = None
    try:
        engine_tbl = engine_df.toArrow()
    except Exception:
        pass
    if engine_tbl is not None and oracle_tbl is not None:
        if (engine_tbl.num_rows > ARROW_COMPARE_THRESHOLD
                and oracle_tbl.num_rows > ARROW_COMPARE_THRESHOLD):
            try:
                return _compare_arrow(engine_cols, engine_tbl,
                                      oracle_cols, oracle_tbl)
            except _ArrowCompareUnsupported:
                pass  # exotic types: fall through to the row path
    engine_rows = (
        _arrow_to_tuples(engine_tbl) if engine_tbl is not None
        else [tuple(r) for r in engine_df.collect()])
    if oracle_rows is None:
        oracle_rows = _arrow_to_tuples(oracle_tbl)

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

def _sql_mask(sql: str) -> str:
    """Length-preserving mask of ``sql`` for structural scanning:
    '--' line comments, single-quoted string literals (with ''
    escapes) and double-quoted identifiers become spaces, so paren
    depth tracking and keyword matching can't be corrupted by parens
    or keywords INSIDE comments/strings (r9 advice: the old scanner
    was comment/string-unaware)."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            for p in range(i, j):
                out[p] = " "
            i = j
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            # /* */ block comment (r10 advice): mask like '--' so a
            # paren or ORDER BY inside it can't corrupt the scan.
            # Unterminated comment masks to end-of-string (the SQL is
            # broken anyway; a silent partial mask would be worse).
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            for p in range(i, j):
                out[p] = " " if sql[p] != "\n" else "\n"
            i = j
        elif ch in ("'", '"'):
            q = ch
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if q == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2  # doubled-quote escape
                        continue
                    break
                j += 1
            j = min(j, n - 1)
            for p in range(i, j + 1):
                out[p] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def count_only_sql(oracle_sql: str) -> str:
    """COUNT(*) wrapper for the rowcap path, with the top-level ORDER
    BY stripped: ordering never changes a COUNT, but DuckDB does NOT
    prune a subquery sort under COUNT — it materializes the full sort
    input (measured: q08's 25-value-key full join at sf10 is ~6e9
    rows, ~270 GB, OOM — round-9 finding). A trailing LIMIT/OFFSET
    after the ORDER BY is kept (it DOES change the count). Only the
    last paren-depth-0 ORDER BY is touched; nested sorts (inside
    window frames or subqueries) stay. Scanning runs over a
    comment/string-masked copy with word-boundary keyword matches
    (r9 advice: parens in comments/strings corrupted depth tracking,
    and an identifier like ``limit_x`` could truncate mid-token)."""
    import re

    sql = oracle_sql
    masked = _sql_mask(sql)
    depth = 0
    last = -1
    ob = re.compile(r"ORDER\s+BY\b", re.IGNORECASE)
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (depth == 0 and ch in "Oo"
              and (i == 0 or not (masked[i - 1].isalnum()
                                  or masked[i - 1] == "_"))
              and ob.match(masked, i)):
            last = i
    if last >= 0:
        tail_m = masked[last:]
        cut = len(tail_m)
        for kw in ("LIMIT", "OFFSET"):
            m = re.search(rf"\b{kw}\b", tail_m, re.IGNORECASE)
            if m:
                cut = min(cut, m.start())
        sql = sql[:last] + sql[last + cut:]
    return f"SELECT COUNT(*) FROM ({sql})"
