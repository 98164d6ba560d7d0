#!/usr/bin/env python
"""Fourth-decade MinHash-LSH probe (r11 verdict stretch 8).

The 100 TB posture's two measured superlinear risks are the LSH
candidate count and the SimHash hot-bucket census. Three decades
(sf0.1 → 1 → 10 → 100) are measured in the scale sweeps; a full
sf300 derivation is disk-infeasible here, but documents scale
independently of the relational tables, so the dedup family alone
gets one more extrapolation point from a docs-only corpus
(`tools/make_sf1.py documents()` at SHREDDER_SF_REPLICAS=3000 —
same replica construction, near-dup density scale-invariant).

Per leg: MinHash-LSH candidate pairs before exact verification (the
quantity that must stay ~linear for banding to survive scale-up),
verified pairs, and wall times. The SimHash half of the probe is
`tools/simhash_decompose.py` with SWEEP_SFS=100,300 (its census +
stage decomposition already generalize; this tool covers the tier it
doesn't).

    SWEEP_SFS=100,300 python tools/dedup_decade_probe.py > OUT.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": os.environ.get("SHREDDER_SF1_DIR", "/tmp/shredder_sf1"),
    "10": os.environ.get("SHREDDER_SF10_DIR", "/tmp/shredder_sf10"),
    "100": os.environ.get("SHREDDER_SF100_DIR", "/tmp/shredder_sf100"),
    "300": os.environ.get("SHREDDER_SF300_DIR", "/tmp/shredder_sf300docs"),
}
_only = os.environ.get("SWEEP_SFS", "100,300")
SF_DIRS = {k: v for k, v in SF_DIRS.items()
           if k in {x.strip() for x in _only.split(",")}}


def main() -> None:
    from shredder_spark.benchcontrol import GapControl
    from shredder_spark.catalog import load_table
    from shredder_spark.operators.dedup import minhash_lsh_pairs
    from shredder_spark.session import get_spark

    spark = get_spark("dedup-decade-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ctl = GapControl(spark, per_gap=2, every=1)
    out: dict = {"metric": "minhash_decade_probe", "threshold": 0.8,
                 "legs": {}}
    for sf, d in SF_DIRS.items():
        if not os.path.isdir(d):
            out["legs"][sf] = {"skipped": f"missing {d}"}
            continue
        docs = load_table(spark, d, "documents")
        leg: dict = {"sf_dir": d, "n_docs": docs.count()}

        ctl.gap()
        t0 = time.time()
        leg["candidates"] = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, verify=False).count()
        leg["t_candidates"] = round(time.time() - t0, 2)

        ctl.gap()
        t0 = time.time()
        leg["pairs"] = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8).count()
        leg["t_pairs"] = round(time.time() - t0, 2)
        ctl.gap()

        leg["candidates_per_doc"] = round(
            leg["candidates"] / max(leg["n_docs"], 1), 2)
        out["legs"][sf] = leg
        print(f"sf{sf}: {json.dumps(leg)}", file=sys.stderr)

    # per-decade slope (10x docs → candidate multiple; <10 = sublinear
    # per doc, the property the banding design must keep)
    labels = [k for k in ("0.1", "1", "10", "100", "300")
              if k in out["legs"] and "candidates" in out["legs"][k]]
    slopes = {}
    for lo, hi in zip(labels, labels[1:]):
        nd = (out["legs"][hi]["n_docs"]
              / max(out["legs"][lo]["n_docs"], 1))
        slopes[f"{lo}->{hi}"] = {
            "docs_x": round(nd, 2),
            "candidates_x": round(
                out["legs"][hi]["candidates"]
                / max(out["legs"][lo]["candidates"], 1), 2),
            "pairs_x": round(
                out["legs"][hi]["pairs"]
                / max(out["legs"][lo]["pairs"], 1), 2),
        }
    out["slopes"] = slopes
    out["control"] = ctl.stamp()
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
