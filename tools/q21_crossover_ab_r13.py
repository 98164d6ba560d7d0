#!/usr/bin/env python
"""Round-13 q21-vs-q421-tier crossover A/B at sf10 (r12 verdict item 6).

r12 measured the two shapes at sf0.1 only (plain window 1.40 s vs
two-phase grouped-rank tier 2.09 s — the tier loses on fixed driver
jobs at that size). The open, data-gated question: does the tier win
at sf >= 10, where the plain shape's three single-task sorts of 20 M
rows each are the wall?

Legs over the derived sf10 lineitem (60 M rows):
  plain_window  q21's declared shape: Window PARTITION BY l_returnflag
                (3 values -> 3 sort tasks at any parallelism)
  grouped_tier  q421's with_grouped_ranks two-phase bucketed shape

Multiset equality of the two outputs is asserted before timing via
count + sum(xxhash64(*)) (60 M rows; exceptAll would dwarf the A/B).
The tier persists its window output within one call, so each timed
rep REBUILDS the frame and clears the cache — no rep reads a prior
rep's blocks.

Usage: python tools/q21_crossover_ab_r13.py [reps] [out.json]
  SF10_REL_DIR (default /tmp/shredder_sf10rel) must hold
  lineitem.parquet (the make_sf1 replica construction at REPLICAS=100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

Q21 = """
SELECT l_orderkey, l_linenumber,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
       CAST(NTILE(4) OVER w AS BIGINT) AS nt
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
ORDER BY l_orderkey, l_linenumber
"""


def fingerprint(df) -> tuple:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("l_orderkey", "l_linenumber", "rn", "rk",
                         "drk", "nt").cast("decimal(38,0)")).alias("h")
    ).collect()[0]
    return row.n, int(row.h)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "Q21_CROSSOVER_AB_r13.json")
    rel_dir = os.environ.get("SF10_REL_DIR", "/tmp/shredder_sf10rel")

    from shredder_spark.benchcontrol import GapControl, drain
    from shredder_spark.catalog import load_table
    from shredder_spark.operators.scale_windows import q21_scale
    from shredder_spark.session import get_spark

    spark = get_spark("q21-crossover-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, rel_dir, "lineitem").createOrReplaceTempView(
        "lineitem")

    def build(name: str):
        if name == "plain_window":
            return spark.sql(Q21)
        return q21_scale(spark, rel_dir)

    fp_plain = fingerprint(build("plain_window"))
    spark.catalog.clearCache()
    fp_tier = fingerprint(build("grouped_tier"))
    spark.catalog.clearCache()
    print(json.dumps({"plain": fp_plain, "tier": fp_tier}))
    assert fp_plain == fp_tier, (fp_plain, fp_tier)

    legs = ["plain_window", "grouped_tier"]
    gc = GapControl(spark, per_gap=2)
    times: dict[str, list[float]] = {k: [] for k in legs}
    gis: dict[str, list[int]] = {k: [] for k in legs}
    for _ in range(reps):
        for name in legs:
            gc.gap()
            gi = gc.gap_index()
            spark.sparkContext.setJobDescription(f"q21 {name}")
            t0 = time.perf_counter()
            drain(build(name))
            times[name].append(round(time.perf_counter() - t0, 4))
            gis[name].append(gi)
            spark.catalog.clearCache()
    gc.gap()

    def st(name: str) -> dict:
        med = statistics.median(times[name])
        norm = [round(t / gc.local_vs_ref(gi), 4)
                for t, gi in zip(times[name], gis[name])]
        return {"reps_s": times[name], "median_s": round(med, 4),
                "normalized_reps_s": norm,
                "normalized_median_s": round(statistics.median(norm), 4)}

    stats = {k: st(k) for k in legs}
    out = {
        "metric": "q21_crossover_ab_r13",
        "rel_dir": rel_dir,
        "reps": reps,
        "n_rows": fp_plain[0],
        "legs": stats,
        "tier_vs_plain_speedup": round(
            stats["plain_window"]["normalized_median_s"]
            / stats["grouped_tier"]["normalized_median_s"], 3),
        "control": gc.stamp(),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(stats))
    print(json.dumps({"tier_vs_plain_speedup": out["tier_vs_plain_speedup"],
                      "control": out["control"]}))
    print("written:", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
