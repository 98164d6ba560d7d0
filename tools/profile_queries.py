"""Engine-side runtime profile of the full registry at a given sf.

The oracle sweeps prove correctness but don't time the Spark side in
isolation; this tool runs EVERY registry query (engine plan only, no
DuckDB) and records wall time per query, so the slowest plans can be
audited for scale problems ("would this survive another 100x?") with
data instead of intuition.

    python tools/profile_queries.py [sf_dir] > QUERY_PROFILE.json

Results are collected via count() on the final DataFrame (forces full
execution of every operator without driver-side materialization of
wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from shredder_spark import queries as queries_mod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shredder_sf1"


def main() -> None:
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries_mod.registry()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for name in sorted(reg):
        q = reg[name]
        t = time.time()
        try:
            q.run(spark, SF_DIR).count()
            times[name] = round(time.time() - t, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:150]
        print(f"{name} {times.get(name, 'ERR')}", file=sys.stderr)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    from shredder_spark.benchcontrol import control_stats
    print(json.dumps({
        "metric": "query_profile",
        "sf_dir": SF_DIR,
        "n": len(times),
        "total_sec": round(sum(times.values()), 1),
        "elapsed_sec": round(time.time() - t0, 1),
        "top30": dict(ranked[:30]),
        "p50": ranked[len(ranked) // 2][1] if ranked else None,
        "errors": errors,
        "control": control_stats(spark),
    }))


if __name__ == "__main__":
    main()
