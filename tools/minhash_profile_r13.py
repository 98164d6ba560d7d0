#!/usr/bin/env python
"""Round-13 MinHash-LSH stage profile at sf10 (r12 verdict item 4).

q110 is the biggest headline row (3.93 s raw / 2.22 normalized at
sf0.1). At sf0.1 the non-dominant stages are ~0.2-0.6 s each —
fixed-cost noise — so the attack must be chosen from an sf10 profile.
Stages are the operator's OWN lazy frames (via the ``_stages`` hook,
simhash pattern), drained to noop, interleaved with control gaps:

  sig         tokenize + 64-permutation signature
  banded      + band hashes + explode (16/doc)
  buckets     + groupBy(band, bh) collect_list + size filter
  cand_multi  + in-array pair emission (before dropDuplicates)
  cand        + dropDuplicates([i, j])   <- the exchange item 4 names
  pairs       + verify join + jaccard filter (full q110 body)

Also records candidate multiplicity (cand_multi vs cand counts) — the
quantity that decides whether banded exactly-once emission can pay.

Usage: python tools/minhash_profile_r13.py [reps] [out.json]
  SF10_DOCS_DIR (default /tmp/shredder_sf10docs) must hold a
  documents.parquet (tools/make_sf1.py documents() at REPLICAS=100).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "MINHASH_PROFILE_r13.json")
    docs_dir = os.environ.get("SF10_DOCS_DIR", "/tmp/shredder_sf10docs")

    from shredder_spark.benchcontrol import GapControl, drain
    from shredder_spark.catalog import load_table
    from shredder_spark.operators.dedup import minhash_lsh_pairs
    from shredder_spark.session import get_spark

    spark = get_spark("minhash-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, docs_dir, "documents")

    stages: dict = {}
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8,
                              _stages=stages)
    stages["pairs"] = pairs
    order = ["sig", "banded", "buckets", "cand_multi", "cand", "pairs"]

    gc = GapControl(spark, per_gap=2)
    for name in order:  # warm-up
        drain(stages[name])
    times: dict[str, list[float]] = {k: [] for k in order}
    gis: dict[str, list[int]] = {k: [] for k in order}
    for _ in range(reps):
        for name in order:  # interleaved
            gc.gap()
            gi = gc.gap_index()
            t0 = time.perf_counter()
            drain(stages[name])
            times[name].append(round(time.perf_counter() - t0, 4))
            gis[name].append(gi)
    gc.gap()

    counts = {
        "n_docs": docs.count(),
        "cand_multi": stages["cand_multi"].count(),
        "cand": stages["cand"].count(),
        "pairs": stages["pairs"].count(),
    }
    counts["multiplicity"] = round(
        counts["cand_multi"] / max(counts["cand"], 1), 3)

    def st(name: str) -> dict:
        med = statistics.median(times[name])
        nmed = statistics.median(
            [round(t / gc.local_vs_ref(gi), 4)
             for t, gi in zip(times[name], gis[name])])
        return {"reps_s": times[name], "median_s": round(med, 4),
                "normalized_median_s": round(nmed, 4)}

    stats = {k: st(k) for k in order}
    # cumulative stages: the marginal cost of each step
    marg = {}
    prev = 0.0
    for k in order:
        marg[k] = round(stats[k]["normalized_median_s"] - prev, 4)
        prev = stats[k]["normalized_median_s"]

    out = {
        "metric": "minhash_profile_r13",
        "docs_dir": docs_dir,
        "reps": reps,
        "counts": counts,
        "stages_cumulative": stats,
        "stages_marginal_normalized_s": marg,
        "control": gc.stamp(),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(counts))
    print(json.dumps({k: stats[k]["normalized_median_s"] for k in order}))
    print(json.dumps({"marginal": marg, "control": out["control"]}))
    print("written:", out_path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
