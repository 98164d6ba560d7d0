"""Round-12 optimization instrument: decompose each headline bench
query into (a) catalog/view-registration driver overhead, (b) plan
build + first-action dispatch, (c) steady-state execution — and dump
the formatted physical plan for plans/r12/<name>_before|after.txt.

The guide (§1) says measure before changing: bench.py times
``reg[name].run(spark, sf_dir)`` + a noop drain, and ``Query.run``
re-registers all 10 temp views on every call — so the per-query
number conflates catalog metadata work with query execution. This
tool separates them so the optimization targets the right thing.

    python tools/bench_breakdown_r12.py [before|after] [sf_dir]

Writes plans/r12/<query>_<tag>.txt and prints one JSON line with the
decomposition.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shredder_spark import queries as queries_mod
from shredder_spark.benchcontrol import control_stats, drain
from shredder_spark.catalog import register_views
from shredder_spark.session import get_spark

HEADLINE = [
    "q01_scan_count",
    "q05_inner_join",
    "q15_pricing_summary",
    "q21_ranking_windows",
    "q43_cosine_topk",
    "q50_term_frequency",
    "q53_quality_score",
    "q76_asof_union_trick",
    "q110_minhash_dedup_full",
    "q140_bm25_search",
]

REPS = 5


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("bench-breakdown-r12")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries_mod.registry()

    # --- catalog overhead: time register_views itself, repeated ---
    rv = []
    for _ in range(8):
        t0 = time.perf_counter()
        register_views(spark, sf_dir)
        rv.append(round(time.perf_counter() - t0, 4))

    out: dict = {"tag": tag, "sf_dir": sf_dir,
                 "register_views_reps_s": rv,
                 "register_views_median_s": round(statistics.median(rv), 4)}

    # --- per-query: plan dump + timed decomposition ---
    qrows: dict = {}
    for name in HEADLINE:
        q = reg[name]
        spark.sparkContext.setJobDescription(f"breakdown:{name}")
        # warm-up (codegen compile, page cache)
        drain(q.run(spark, sf_dir))
        # plan dump (once, post-warm-up)
        df = q.run(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        # timed: full run (register_views + build + execute) vs
        # execute-only (plan prebuilt, views already registered)
        full, exe, build = [], [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            drain(q.run(spark, sf_dir))
            full.append(round(time.perf_counter() - t0, 4))

            t0 = time.perf_counter()
            df2 = q.run(spark, sf_dir)
            build.append(round(time.perf_counter() - t0, 4))
            t0 = time.perf_counter()
            drain(df2)
            exe.append(round(time.perf_counter() - t0, 4))
        qrows[name] = {
            "full_median_s": round(statistics.median(full), 4),
            "build_median_s": round(statistics.median(build), 4),
            "exec_median_s": round(statistics.median(exe), 4),
            "full_reps": full,
        }
        spark.sparkContext.setJobDescription(None)
    out["queries"] = qrows
    out["control"] = control_stats(spark, reps=5)
    out_path = f"/tmp/BENCH_BREAKDOWN_r12_{tag}.json"
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": out_path,
                      "register_views_median_s": out[
                          "register_views_median_s"],
                      "totals": {n: r["full_median_s"]
                                 for n, r in qrows.items()}}))


if __name__ == "__main__":
    main()
