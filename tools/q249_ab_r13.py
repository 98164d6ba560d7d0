#!/usr/bin/env python
"""Round-13 q249 bigram-LM A/B at sf10 (r12 verdict item 5).

q249 is the most expensive path in the sf100 profile (422 s
normalized). Its r12 engine text scans + tokenizes + explodes the
corpus FOUR times: the final per-doc join reads `pairs` once, and the
cnt2 / cnt1 / v CTE references each re-expand the whole explode
subtree (Spark expands CTEs; the inferred not-null filters differ per
branch, so neither ReuseExchange nor the AQE stage cache unifies
them).

NEW shape (guide §2.3/§2.4, worked-example §8 "decide with small
rows"): aggregate the explode ONCE into per-doc bigram counts
`dcnt = (doc_id, w1, w2, k)`; derive cnt2 = SUM(k) GROUP BY (w1, w2)
from dcnt, cnt1 / v from cnt2 (aggregations of aggregates — exact,
integer-valued); broadcast the per-bigram score table back onto dcnt
and finish with a weighted mean SUM(k*s)/SUM(k) per doc. The explode
branches are written identically (explicit not-null pair filter) so
the (doc_id, w1, w2) exchange canonicalizes equal across branches and
stage reuse CAN collapse them; even where it does not, every stats
branch above the explode ships distinct bigram counts, never the
instance relation, and the instance relation is never broadcast
(the r12 plan broadcast the full pairs relation — unviable at scale).

Result equality (not just count) is asserted before timing.

Usage: python tools/q249_ab_r13.py [reps] [out.json]
  SF10_DOCS_DIR (default /tmp/shredder_sf10docs) must hold
  documents.parquet (tools/make_sf1.py documents() at REPLICAS=100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD = """
WITH toks AS (SELECT doc_id, SPLIT(text, ' ') AS t FROM documents),
big AS (SELECT doc_id,
               IF(SIZE(t) >= 2,
                  TRANSFORM(SEQUENCE(1, SIZE(t) - 1),
                            i -> STRUCT(ELEMENT_AT(t, i) AS w1,
                                        ELEMENT_AT(t, i + 1) AS w2)),
                  ARRAY()) AS bs
        FROM toks WHERE SIZE(t) >= 2),
pairs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
          FROM big LATERAL VIEW EXPLODE(bs) x AS b),
cnt2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2
         FROM pairs GROUP BY w1, w2),
cnt1 AS (SELECT w1, SUM(c2) AS c1 FROM cnt2 GROUP BY w1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vs FROM cnt1),
sc AS (SELECT c.w1, c.w2, -LN((c.c2 + 1.0) / (c1.c1 + v.vs)) AS s
       FROM cnt2 c JOIN cnt1 c1 ON c1.w1 = c.w1 CROSS JOIN v)
SELECT p.doc_id,
       ROUND(AVG(sc.s), 4) AS nll,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams
FROM pairs p
JOIN sc ON sc.w1 = p.w1 AND sc.w2 = p.w2
GROUP BY p.doc_id ORDER BY p.doc_id
"""

NEW = """
WITH toks AS (SELECT doc_id, SPLIT(text, ' ') AS t FROM documents),
big AS (SELECT doc_id,
               IF(SIZE(t) >= 2,
                  TRANSFORM(SEQUENCE(1, SIZE(t) - 1),
                            i -> STRUCT(ELEMENT_AT(t, i) AS w1,
                                        ELEMENT_AT(t, i + 1) AS w2)),
                  ARRAY()) AS bs
        FROM toks WHERE SIZE(t) >= 2),
pairs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
          FROM big LATERAL VIEW EXPLODE(bs) x AS b
          WHERE b.w1 IS NOT NULL AND b.w2 IS NOT NULL),
dcnt AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS DOUBLE) AS k
         FROM pairs GROUP BY doc_id, w1, w2),
cnt2 AS (SELECT w1, w2, SUM(k) AS c2 FROM dcnt GROUP BY w1, w2),
cnt1 AS (SELECT w1, SUM(c2) AS c1 FROM cnt2 GROUP BY w1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vs FROM cnt1
      WHERE c1 IS NOT NULL),
sc AS (SELECT c.w1, c.w2, -LN((c.c2 + 1.0) / (c1.c1 + v.vs)) AS s
       FROM cnt2 c JOIN cnt1 c1 ON c1.w1 = c.w1 CROSS JOIN v)
SELECT /*+ BROADCAST(sc) */ d.doc_id,
       ROUND(SUM(d.k * sc.s) / SUM(d.k), 4) AS nll,
       CAST(SUM(d.k) AS BIGINT) AS n_bigrams
FROM dcnt d JOIN sc ON sc.w1 = d.w1 AND sc.w2 = d.w2
GROUP BY d.doc_id ORDER BY d.doc_id
"""


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else "Q249_AB_r13.json"
    docs_dir = os.environ.get("SF10_DOCS_DIR", "/tmp/shredder_sf10docs")

    from shredder_spark.benchcontrol import GapControl, drain
    from shredder_spark.catalog import load_table
    from shredder_spark.session import get_spark

    spark = get_spark("q249-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, docs_dir, "documents").createOrReplaceTempView(
        "documents")

    legs = {"old_4scan": spark.sql(OLD), "new_dcnt": spark.sql(NEW)}

    # Result equality (values, not counts): anti-join in both
    # directions over all three output columns must be empty.
    a, b = legs["old_4scan"], legs["new_dcnt"]
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    n = a.count()
    print(json.dumps({"rows": n, "old_minus_new": d1, "new_minus_old": d2}))
    assert d1 == 0 and d2 == 0, (d1, d2)

    gc = GapControl(spark, per_gap=2)
    for df in legs.values():
        drain(df)  # warm-up
    times: dict[str, list[float]] = {k: [] for k in legs}
    gis: dict[str, list[int]] = {k: [] for k in legs}
    for _ in range(reps):
        for name, df in legs.items():
            gc.gap()
            gi = gc.gap_index()
            spark.sparkContext.setJobDescription(f"q249 {name}")
            t0 = time.perf_counter()
            drain(df)
            times[name].append(round(time.perf_counter() - t0, 4))
            gis[name].append(gi)
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
        "metric": "q249_ab_r13",
        "docs_dir": docs_dir,
        "reps": reps,
        "n_rows": n,
        "legs": stats,
        "new_vs_old_speedup": round(
            stats["old_4scan"]["normalized_median_s"]
            / stats["new_dcnt"]["normalized_median_s"], 3),
        "control": gc.stamp(),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(stats))
    print(json.dumps({"new_vs_old_speedup": out["new_vs_old_speedup"],
                      "control": out["control"]}))
    print("written:", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
