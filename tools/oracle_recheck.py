"""Targeted oracle recheck: run NAMED registry queries at an sf and
value-compare each against its DuckDB oracle (count-only above the
rowcap), recording wall time — the post-fix verification shape the
r9 sweeps used (``post_fix_recheck``), as a standalone tool.

    python tools/oracle_recheck.py SF_DIR q08_full_join q151_... \
        > RECHECK.json

Env: SWEEP_THREADS / SWEEP_DRIVER_MEM / SWEEP_SHUFFLE_PARTITIONS /
SWEEP_ROWCAP (default 2,000,000) / ORACLE_DUCKDB_MEM / SWEEP_OUT.
Rows-only queries (no oracle) record count + wall only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from shredder_spark import queries as queries_mod
from tests.oracle_utils import compare_query, count_only_sql, duckdb_connect

SF_DIR = sys.argv[1]
NAMES = sys.argv[2:]


def main() -> None:
    n_threads = int(os.environ.get("SWEEP_THREADS", "16"))
    shuffle_parts = os.environ.get("SWEEP_SHUFFLE_PARTITIONS",
                                   str(n_threads))
    rowcap = int(os.environ.get("SWEEP_ROWCAP", "2000000"))
    spark = (SparkSession.builder.master(f"local[{n_threads}]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", shuffle_parts)
             .config("spark.driver.memory",
                     os.environ.get("SWEEP_DRIVER_MEM", "32g"))
             .config("spark.driver.maxResultSize", "8g")
             .config("spark.cleaner.periodicGC.interval", "2min")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from shredder_spark.benchcontrol import GapControl
    ctl = GapControl(spark, per_gap=2, every=1)
    reg = queries_mod.registry()
    results: dict = {}
    for name in NAMES:
        q = reg[name]
        ctl.gap()
        rec: dict = {}
        try:
            t0 = time.time()
            n_eng = q.run(spark, SF_DIR).count()
            rec["engine_rows"] = n_eng
            rec["engine_wall_s"] = round(time.time() - t0, 2)
            if q.oracle is None:
                rec["check"] = "rows-only"
            elif n_eng > rowcap:
                con = duckdb_connect(SF_DIR)
                try:
                    n_ora = con.execute(
                        count_only_sql(q.oracle)).fetchone()[0]
                finally:
                    con.close()
                rec["oracle_rows"] = n_ora
                rec["check"] = ("count-only:PASS" if n_eng == n_ora
                                else "count-only:FAIL")
            else:
                problems = compare_query(spark, SF_DIR, q)
                rec["check"] = "value:PASS" if not problems else problems
        except Exception as e:  # noqa: BLE001
            rec["check"] = f"exception: {str(e)[:200]}"
        results[name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)
    ctl.gap()
    out = {"metric": "oracle_recheck", "sf_dir": SF_DIR,
           "rowcap": rowcap, "results": results,
           "control": ctl.stamp()}
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
