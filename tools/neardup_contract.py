"""Incremental near-dup contract at one sf — the focused version of
scale_sweep.py's neardup leg (r9 verdict task 3: the sf100 sweep ran
with SWEEP_SKIP_INCREMENTAL, so the streaming-ingest dedup tier's
flatness/equality claims stopped at sf10; this closes the third
decade without re-running the whole sweep).

Contract (same as scale_sweep's capped production shape at sf1+):
- batch tier: ``dedupe_keepers`` with max_bucket_size=200;
- incremental tier: 8 arrival batches through
  ``streaming/neardup.IncrementalNearDup`` (compact_every=4), fed the
  MATCHING oversized-bucket blocklist so both tiers decide over the
  same pair universe;
- asserts admitted == keepers (exact set equality at 5 M docs);
- flatness: last-quarter mean per-batch wall over second-quarter mean
  (~1.0 = per-batch cost independent of accumulated epochs).

    python tools/neardup_contract.py [sf_dir] [out.json]
    (defaults: /tmp/shredder_sf100, NEARDUP_CONTRACT.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shredder_sf100"
OUT = sys.argv[2] if len(sys.argv) > 2 else "NEARDUP_CONTRACT.json"


def main() -> None:
    import pyspark.sql.functions as F

    from shredder_spark.benchcontrol import GapControl
    from shredder_spark.catalog import load_table
    from shredder_spark.operators.dedup import (dedupe_keepers,
                                                oversized_lsh_buckets)
    from shredder_spark.session import get_spark
    from shredder_spark.streaming.neardup import IncrementalNearDup

    spark = get_spark("neardup-contract")
    spark.sparkContext.setLogLevel("ERROR")
    ctl = GapControl(spark, per_gap=2, every=1)

    src = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    lsh = dict(num_perm=64, bands=16, threshold=0.5, seed=1)
    cap = 200

    ctl.gap()
    blocklist = oversized_lsh_buckets(
        src, "doc_id", "text", max_bucket_size=cap,
        num_perm=lsh["num_perm"], bands=lsh["bands"],
        seed=lsh["seed"]).localCheckpoint(eager=True)

    print("batch dedup", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    keepers = {r.doc_id for r in dedupe_keepers(
        src, "doc_id", "text", max_bucket_size=cap, **lsh).collect()}
    batch_s = time.perf_counter() - t0

    ctl.gap()
    state = tempfile.mkdtemp(prefix="neardup_contract_")
    try:
        n_batches = 8
        op = IncrementalNearDup(spark, state, exclude_buckets=blocklist,
                                compact_every=4, **lsh)
        ids = sorted(r.doc_id for r in src.select("doc_id").collect())
        cuts = [ids[len(ids) * k // n_batches]
                for k in range(1, n_batches)] + [ids[-1] + 1]
        admitted: set = set()
        lo = ids[0]
        batch_times: list = []
        t0 = time.perf_counter()
        for bi, hi in enumerate(cuts):
            tb = time.perf_counter()
            b = src.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            admitted |= {r.doc_id for r in op.process_batch(b).collect()}
            batch_times.append(round(time.perf_counter() - tb, 3))
            print(f"batch {bi}: {batch_times[-1]}s", file=sys.stderr,
                  flush=True)
            lo = hi
        inc_s = time.perf_counter() - t0
    finally:
        shutil.rmtree(state, ignore_errors=True)
    ctl.gap()

    q2, q4 = batch_times[2:4], batch_times[6:8]
    out = {
        "metric": "neardup_incremental_contract",
        "sf_dir": SF_DIR,
        "docs": len(ids),
        "contract": "capped-200+blocklist",
        "neardup_batch_s": round(batch_s, 3),
        "neardup_incremental_s": round(inc_s, 3),
        "neardup_per_batch_s": batch_times,
        "neardup_flatness_last_over_mid": round(
            (sum(q4) / len(q4)) / max(sum(q2) / len(q2), 1e-9), 3),
        "neardup_equal": bool(admitted == keepers),
        "neardup_keepers": len(keepers),
        "neardup_admitted": len(admitted),
        "control": ctl.stamp(),
    }
    print(json.dumps(out))
    with open(OUT, "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
