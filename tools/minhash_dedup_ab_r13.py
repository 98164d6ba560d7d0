#!/usr/bin/env python
"""Round-13 q110 dedup-placement A/B at sf10 (r12 verdict item 4).

One session, interleaved reps: OLD shape (dropDuplicates on the full
candidate multi-set BEFORE the verify joins — the r12 pipeline) vs
NEW shape (verify the multi-set, dropDuplicates on the scored
survivors — the r13 operator). The old shape is rebuilt inline from
the operator's own _stages frames (sig/banding/bucketing identical by
construction); pair-set equality of the two variants is asserted
before timing.

Usage: python tools/minhash_dedup_ab_r13.py [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def verify_leg(docs, cand, threshold: float):
    """The operator's verify body (dedup.py) over a candidate frame."""
    from shredder_spark.operators.dedup import tokens_col
    from shredder_spark.partitioning import spread_small_input

    tsrc = spread_small_input(
        docs.select(F.col("doc_id").alias("_id"),
                    F.col("text").alias("_text")), "_id")
    txt = tsrc.select(
        "_id",
        F.transform(tokens_col(F.col("_text")),
                    lambda x: F.xxhash64(x)).alias("_tok"),
    ).select("_id", "_tok", F.size("_tok").alias("_n"))
    cand = (cand
            .join(txt.select(F.col("_id").alias("i"),
                             F.col("_tok").alias("ti"),
                             F.col("_n").alias("ni")), "i")
            .join(txt.select(F.col("_id").alias("j"),
                             F.col("_tok").alias("tj"),
                             F.col("_n").alias("nj")), "j"))
    inter = F.size(F.array_intersect("ti", "tj"))
    union = (F.col("ni") + F.col("nj") - inter).cast("double")
    return (cand.select("i", "j", (inter / union).alias("jaccard"))
            .filter(F.coalesce(F.col("jaccard"), F.lit(-1.0)) >= threshold))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "MINHASH_DEDUP_AB_r13.json")
    docs_dir = os.environ.get("SF10_DOCS_DIR", "/tmp/shredder_sf10docs")

    from shredder_spark.benchcontrol import GapControl, drain
    from shredder_spark.catalog import load_table
    from shredder_spark.operators.dedup import minhash_lsh_pairs
    from shredder_spark.session import get_spark

    spark = get_spark("minhash-dedup-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, docs_dir, "documents")

    stages: dict = {}
    new_pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                                  _stages=stages)
    old_pairs = verify_leg(docs, stages["cand"], 0.8)  # deduped pre-join

    n_new = new_pairs.count()
    n_old = old_pairs.count()
    print(json.dumps({"n_new": n_new, "n_old": n_old}))
    assert n_new == n_old, (n_new, n_old)

    legs = {"old_dedup_before_verify": old_pairs,
            "new_dedup_after_verify": new_pairs}
    gc = GapControl(spark, per_gap=2)
    for df in legs.values():
        drain(df)  # warm-up
    times: dict[str, list[float]] = {k: [] for k in legs}
    gis: dict[str, list[int]] = {k: [] for k in legs}
    for _ in range(reps):
        for name, df in legs.items():
            gc.gap()
            gi = gc.gap_index()
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
        "metric": "minhash_dedup_ab_r13",
        "docs_dir": docs_dir,
        "reps": reps,
        "n_pairs": n_new,
        "legs": stats,
        "new_vs_old": round(
            stats["old_dedup_before_verify"]["normalized_median_s"]
            / stats["new_dedup_after_verify"]["normalized_median_s"], 3),
        "control": gc.stamp(),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(stats))
    print(json.dumps({"new_vs_old": out["new_vs_old"],
                      "control": out["control"]}))
    print("written:", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
