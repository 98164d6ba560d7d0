"""Full-registry oracle sweep: EVERY oracle-paired query vs DuckDB at
an arbitrary sf (default sf0.1 — 10x the driver's correctness gate).
Rows-only queries are executed for shape/stability but not compared.

    python tools/oracle_sweep_full.py [sf_dir] [sample_n] [seed] > SWEEP.json

``sample_n`` (optional) runs a seeded random subsample of the paired
registry instead of all of it — the sf10 decade-probe spot-check shape
(rows-only queries are skipped in sample mode).

``SWEEP_SHARD=i/k`` (env) runs the i-th of k deterministic shards
(name-sorted round robin) — the full-registry sf10 pass is ~6 h
single-process, so it runs as k concurrent shard processes (each with
its own Spark/DuckDB) merged by tools/merge_sweep_shards.py.

Artifacts are stamped with the bracketing GapControl (a 2-rep control
gap every 25 queries, 20 %-trimmed core — round-8 verdict task 3), not
the old end-of-run 5-rep control.

Big-sf prerequisite: raise ``vm.max_map_count`` (default 65530) before
a sf10+ run — q231-class DuckDB oracles (per-byte explode +
STRING_AGG over a 750 M-row intermediate) allocate ~65 k mmap regions;
at the kernel default the allocator hits the map ceiling with plenty
of free RAM, reports OOM at tiny sizes, and leaves the process wedged
(r9 finding: `sysctl -w vm.max_map_count=1048576`).

Prints one JSON line: counts + per-query failures (empty list = all
green). Uses the same vanilla-session + canonicalization conventions
as the driver (tests/oracle_utils.compare_query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from shredder_spark import queries as queries_mod
from tests.oracle_utils import compare_query, duckdb_connect  # noqa: F401

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SAMPLE_N = int(sys.argv[2]) if len(sys.argv) > 2 else 0
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def main() -> None:
    shard = os.environ.get("SWEEP_SHARD")
    n_threads = int(os.environ.get("SWEEP_THREADS", "16"))
    driver_mem = os.environ.get("SWEEP_DRIVER_MEM", "24g")
    # see profile_queries.py: initial shuffle partitioning bounds
    # per-task sort-array size on big-sf fact-fact joins (AQE
    # coalesces the small ones back down); sf100 runs pass 64
    shuffle_parts = os.environ.get("SWEEP_SHUFFLE_PARTITIONS",
                                   str(n_threads))
    spark = (SparkSession.builder.master(f"local[{n_threads}]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", shuffle_parts)
             # Spark's default 1g driver heap OOMs around the heavier
             # sf0.1 sort/join queries in a 682-query single-JVM run;
             # the box has 128 GiB — size the heap like session.py does
             .config("spark.driver.memory", driver_mem)
             .config("spark.driver.maxResultSize", "8g")
             # frequent ContextCleaner cycles: stale shuffle files of
             # finished queries otherwise persist until a driver GC,
             # which a big heap can defer across many queries (r10)
             .config("spark.cleaner.periodicGC.interval", "2min")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from shredder_spark.benchcontrol import GapControl
    ctl = GapControl(spark, per_gap=2, every=25)
    reg = queries_mod.registry()
    names = sorted(reg)
    if SAMPLE_N:
        import random

        paired = [n for n in names if reg[n].oracle is not None]
        names = sorted(random.Random(SEED).sample(
            paired, min(SAMPLE_N, len(paired))))
    if shard:
        i, k = (int(x) for x in shard.split("/"))
        names = [n for j, n in enumerate(names) if j % k == i]
    t0 = time.time()
    failures: dict[str, list[str]] = {}
    # r11 (r10 verdict task 2): queries whose DuckDB oracle is
    # resource-infeasible at the target sf get an EXPLICIT
    # disposition row (engine executed + timed, oracle skipped with
    # the reason) instead of a silent skip or a spill-to-disk-full
    # crash. Names via SWEEP_ORACLE_INFEASIBLE=comma,list.
    infeasible = {n for n in os.environ.get(
        "SWEEP_ORACLE_INFEASIBLE", "").split(",") if n}
    dispositioned: dict[str, dict] = {}
    n_paired = n_rows_only = 0
    for name in names:
        q = reg[name]
        ctl.maybe_gap()
        try:
            if name in infeasible and q.oracle is not None:
                tq = time.time()
                n_eng = q.run(spark, SF_DIR).count()
                dispositioned[name] = {
                    "engine_rows": n_eng,
                    "engine_wall_s": round(time.time() - tq, 2),
                    "reason": ("oracle-infeasible at this sf: DuckDB "
                               "side exceeds memory+spill caps; "
                               "engine executed and timed, value "
                               "compare done at smaller sf"),
                }
                print(f"{name} dispositioned (oracle-infeasible)",
                      file=sys.stderr)
                continue
            if q.oracle is None:
                n_rows_only += 1
                assert q.run(spark, SF_DIR).count() >= 0
                continue
            n_paired += 1
            rowcap = int(os.environ.get("SWEEP_ROWCAP", "0"))
            if rowcap:
                n_eng = q.run(spark, SF_DIR).count()
                if n_eng > rowcap:
                    from tests.oracle_utils import (count_only_sql,
                                                    duckdb_connect)
                    con = duckdb_connect(SF_DIR)
                    try:
                        # count_only_sql strips the top-level ORDER
                        # BY: DuckDB materializes a subquery sort
                        # under COUNT(*) (q08@sf10: ~6e9 rows, OOM)
                        n_ora = con.execute(
                            count_only_sql(q.oracle)).fetchone()[0]
                    finally:
                        con.close()  # r9: leaked cons wedged a shard
                    if n_eng != n_ora:
                        failures[name] = [
                            f"count-only mismatch: {n_eng} vs {n_ora}"]
                    continue
            problems = compare_query(spark, SF_DIR, q)
            if problems:
                failures[name] = problems
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"exception: {str(e)[:200]}"]
        print(f"{name} {'FAIL' if name in failures else 'ok'}",
              file=sys.stderr)
    ctl.gap()
    # session-speed stamp: every committed artifact self-describes the
    # VM phase it was measured in (round-6 task 8; bracketed since r9)
    out = {
        "metric": "oracle_sweep_full",
        "sf_dir": SF_DIR,
        "sample_n": SAMPLE_N or None,
        "seed": SEED if SAMPLE_N else None,
        "shard": shard,
        "paired": n_paired,
        "rows_only": n_rows_only,
        "failures": failures,
        "dispositioned": dispositioned or None,
        "elapsed_sec": round(time.time() - t0, 1),
        "control": ctl.stamp(),
    }
    # stdout can be polluted by JVM warnings (GC log lines go to the
    # process stdout); emit the artifact on the LAST line and also to
    # SWEEP_OUT if set, so a redirect always yields valid JSON.
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
