#!/usr/bin/env python
"""Round-13 A/B at sf10 for the CTE-re-expansion fixes (q249's disease
across the registry; CTE_REEXPANSION_SCAN_r13.json is the census).

Queries under test — each was a single-text query, so the OLD Spark
text is exactly the (unchanged) oracle text still in the registry;
the NEW text is the r13 engine_sql:

  q428_mutual_information   4 fact scans -> 1 (cell windows)
  q168_min_cost_supplier    2 -> 1 (per-part MIN window over cost)
  q426_cramers_v            5 -> 2 (cell-derived marginals, nt carried)
  q489_chi_residuals        4 -> 2 (cell-derived marginals)
  q647_interaction_anova    4 -> 1 (cell windows)

Result equality (exceptAll both directions empty) is asserted per
query before timing; legs run interleaved with control gaps.

Usage: python tools/cte_fix_ab_r13.py [reps] [out.json]
  SF10_REL_DIR (default /tmp/shredder_sf10rel) must hold lineitem,
  part, supplier, orders, customer parquet (make_sf1 replicas at 100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q428_mutual_information",
    "q168_min_cost_supplier",
    "q426_cramers_v",
    "q489_chi_residuals",
    "q647_interaction_anova",
]
# Second batch (same harness, CTE_FIX_AB2_r13.json): override with
#   CTE_AB_QUERIES=q510_rfm_migration,q383_count_min_sketch
if os.environ.get("CTE_AB_QUERIES"):
    QUERIES = os.environ["CTE_AB_QUERIES"].split(",")

# Pre-r13 Spark texts for queries whose oracle is DuckDB-dialect (the
# "old = oracle" shortcut only works for shared-dialect single texts).
OLD_TEXTS = {
    "q383_count_min_sketch": """
WITH tok AS (SELECT tok FROM documents
             LATERAL VIEW EXPLODE(SPLIT(text,' ')) x AS tok),
     cell AS (SELECT r.r,
                     CAST(CONV(SUBSTR(MD5(CAST(r.r AS STRING)
                                          || ':' || tok), 1, 8),
                               16, 10) % 64 AS BIGINT) AS c,
                     COUNT(*) AS n
              FROM tok CROSS JOIN
                   (SELECT EXPLODE(SEQUENCE(0, 3)) AS r) r
              GROUP BY r.r, c),
     probe AS (SELECT EXPLODE(ARRAY('spark','query','the','vector','scan'))
                 AS term),
     est AS (SELECT p.term,
                    MIN(cell.n) AS cms_est
             FROM probe p CROSS JOIN
                  (SELECT EXPLODE(SEQUENCE(0, 3)) AS r) pr
             JOIN cell ON cell.r = pr.r
              AND cell.c = CAST(CONV(SUBSTR(MD5(CAST(pr.r AS STRING)
                                                || ':' || p.term), 1, 8),
                                     16, 10) % 64 AS BIGINT)
             GROUP BY p.term),
     truth AS (SELECT tok AS term, COUNT(*) AS n FROM tok GROUP BY tok)
SELECT e.term, CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(COALESCE(t.n, 0) AS BIGINT) AS true_count
FROM est e LEFT JOIN truth t ON t.term = e.term
ORDER BY e.term
""",
}


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CTE_FIX_AB_r13.json"
    rel_dir = os.environ.get("SF10_REL_DIR", "/tmp/shredder_sf10rel")

    from shredder_spark import queries as qm
    from shredder_spark.benchcontrol import GapControl, drain
    from shredder_spark.catalog import load_table
    from shredder_spark.session import get_spark

    spark = get_spark("cte-fix-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "part", "supplier", "orders", "customer"):
        load_table(spark, rel_dir, t).createOrReplaceTempView(t)
    docs_dir = os.environ.get("SF10_DOCS_DIR", "/tmp/shredder_sf10docs")
    if os.path.exists(os.path.join(docs_dir, "documents.parquet")):
        load_table(spark, docs_dir, "documents").createOrReplaceTempView(
            "documents")

    reg = qm.registry()
    legs: dict[str, dict] = {}
    for name in QUERIES:
        q = reg[name]
        old = spark.sql(OLD_TEXTS.get(name, q.oracle))  # pre-r13 text
        new = spark.sql(q.engine_sql)
        d1 = old.exceptAll(new).count()
        d2 = new.exceptAll(old).count()
        n = new.count()
        print(json.dumps({"q": name, "rows": n,
                          "old_minus_new": d1, "new_minus_old": d2}))
        assert d1 == 0 and d2 == 0, (name, d1, d2)
        legs[name] = {"old": old, "new": new}

    gc = GapControl(spark, per_gap=2)
    for frames in legs.values():   # warm-up
        drain(frames["old"])
        drain(frames["new"])
    times: dict[str, list[float]] = {}
    gis: dict[str, list[int]] = {}
    for _ in range(reps):
        for name, frames in legs.items():
            for variant in ("old", "new"):
                key = f"{name}:{variant}"
                gc.gap()
                gi = gc.gap_index()
                spark.sparkContext.setJobDescription(key)
                t0 = time.perf_counter()
                drain(frames[variant])
                times.setdefault(key, []).append(
                    round(time.perf_counter() - t0, 4))
                gis.setdefault(key, []).append(gi)
    gc.gap()

    def st(key: str) -> dict:
        norm = [round(t / gc.local_vs_ref(gi), 4)
                for t, gi in zip(times[key], gis[key])]
        return {"reps_s": times[key],
                "median_s": round(statistics.median(times[key]), 4),
                "normalized_reps_s": norm,
                "normalized_median_s": round(statistics.median(norm), 4)}

    stats = {k: st(k) for k in times}
    speedups = {
        name: round(stats[f"{name}:old"]["normalized_median_s"]
                    / stats[f"{name}:new"]["normalized_median_s"], 3)
        for name in QUERIES
    }
    out = {
        "metric": "cte_fix_ab_r13",
        "rel_dir": rel_dir,
        "reps": reps,
        "legs": stats,
        "new_vs_old_speedup": speedups,
        "control": gc.stamp(),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(speedups))
    print(json.dumps({"control": out["control"]}))
    print("written:", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
