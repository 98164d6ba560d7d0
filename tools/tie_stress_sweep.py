"""Tie-stress sweep: run EVERY oracle-paired query on a tie-flooded
derivation of sf0.001.

Why: ORDER BY / RANK / MIN_BY / top-k queries are only deterministic
across engines if every ordering key is either unique or explicitly
tie-broken. The driver corpora have near-unique doubles and microsecond
timestamps, so a missing tie-break is invisible until real data (or the
sf1 replica construction) produces equal keys — the round-6 sf1 audit
caught q288/q403 exactly this way, by accident. This tool makes the
class systematic: quantize every continuous column so ties are the NORM
(prices to $100 steps, quantities as-is, balances to $10, timestamps to
the hour, event values to $1), keep all keys and references intact, and
compare engine vs oracle on the result. Any query whose output depends
on which tied row an engine picks fails here.

    python tools/tie_stress_sweep.py > TIE_SWEEP.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from shredder_spark import queries as queries_mod
from tests.oracle_utils import compare_query

SRC = "/root/testdata/sf0.001"
DST = os.environ.get("SHREDDER_TIE_DIR", "/tmp/shredder_ties")

# column -> quantization expression (DuckDB SQL over the source table).
# Everything not listed is copied as-is, so keys/joins/filters survive.
QUANT = {
    "orders": {
        "o_totalprice": "CAST(ROUND(o_totalprice / 100) * 100 AS DOUBLE)",
        "o_orderdate": "CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP)",
    },
    "lineitem": {
        "l_extendedprice":
            "CAST(ROUND(l_extendedprice / 100) * 100 AS DOUBLE)",
        "l_discount": "CAST(ROUND(l_discount * 20) / 20 AS DOUBLE)",
        "l_tax": "CAST(ROUND(l_tax * 20) / 20 AS DOUBLE)",
        "l_shipdate": "CAST(DATE_TRUNC('day', l_shipdate) AS TIMESTAMP)",
    },
    "customer": {
        "c_acctbal": "CAST(ROUND(c_acctbal / 10) * 10 AS DOUBLE)",
    },
    "supplier": {
        "s_acctbal": "CAST(ROUND(s_acctbal / 10) * 10 AS DOUBLE)",
    },
    "part": {
        "p_retailprice": "CAST(ROUND(p_retailprice / 10) * 10 AS DOUBLE)",
    },
    "events": {
        "ts": "CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)",
        "value": "CAST(ROUND(value) AS DOUBLE)",
    },
}


def make_tie_tables() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    from shredder_spark.catalog import TABLES
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        subs = QUANT.get(t)
        if not subs:
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        sel = ", ".join(f"{subs[c]} AS {c}" if c in subs else c
                        for c in cols)
        con.execute(f"COPY (SELECT {sel} FROM '{src}') TO '{dst}' "
                    f"(FORMAT PARQUET)")


def main() -> None:
    make_tie_tables()
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries_mod.registry()
    t0 = time.time()
    failures: dict[str, list[str]] = {}
    n_paired = 0
    for name in sorted(reg):
        q = reg[name]
        if q.oracle is None:
            continue
        n_paired += 1
        try:
            problems = compare_query(spark, DST, q)
            if problems:
                failures[name] = problems[:3]
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"exception: {str(e)[:200]}"]
        print(f"{name} {'FAIL' if name in failures else 'ok'}",
              file=sys.stderr)
    from shredder_spark.benchcontrol import control_stats
    print(json.dumps({
        "metric": "tie_stress_sweep",
        "src": SRC, "dst": DST,
        "quantization": {t: sorted(c) for t, c in QUANT.items()},
        "paired": n_paired,
        "n_failures": len(failures),
        "failures": failures,
        "elapsed_sec": round(time.time() - t0, 1),
        "control": control_stats(spark),
    }))


if __name__ == "__main__":
    main()
