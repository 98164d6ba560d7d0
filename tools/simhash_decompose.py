"""Stage decomposition of q115 (SimHash near-dup pairs) across
decades — r9 verdict task 1's second half: the sf10→sf100 wall slope
was 12.6× for 10× docs while emitted pairs grew only 3.4×, and
SCALE.md's "within-bucket pair growth" attribution was incomplete.
This tool times each stage of the REAL pipeline (via the operator's
``_stages`` introspection hook — the same lazy frames
``simhash_pairs`` composes, no re-implementation) so the superlinear
term is measured, not guessed:

1. **fingerprint+quads** — token xxhash64, Arrow SimHash vote, block
   explode, persist (``quads.count()``).
2. **bucket census** — over the persisted quads: bucket count, max
   cold-bucket size, Σ C(size,2) split cold/hot (the candidate volume
   the joins must generate), hot-bucket count (> salt_threshold).
3. **cold band-join** — candidate generation over cold buckets
   (persisted input, so this times the self-join + exactly-once
   emission + hamming eval alone).
4. **hot salted join** — the ``salts``-way replicated join over hot
   buckets (b-side explode ×64: the suspected superlinear term).
5. **full operator** — filtered pairs count (the q115 body).

    python tools/simhash_decompose.py > SIMHASH_DECOMP.json
    SWEEP_SFS=10,100 python tools/simhash_decompose.py ...

Stamped with the frozen session-speed control (GapControl brackets
around every timed leg).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

import pyspark.sql.functions as F

from shredder_spark.catalog import load_table
from shredder_spark.session import get_spark

SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": os.environ.get("SHREDDER_SF1_DIR", "/tmp/shredder_sf1"),
    "10": os.environ.get("SHREDDER_SF10_DIR", "/tmp/shredder_sf10"),
    "100": os.environ.get("SHREDDER_SF100_DIR", "/tmp/shredder_sf100"),
    # r12 fourth-decade probe: docs-only derivation (documents scale
    # independently of the relational tables; this tool reads nothing
    # else) — tools/make_sf1.py documents() at SHREDDER_SF_REPLICAS=3000
    "300": os.environ.get("SHREDDER_SF300_DIR", "/tmp/shredder_sf300docs"),
}
_only = os.environ.get("SWEEP_SFS", "10,100")
SF_DIRS = {k: v for k, v in SF_DIRS.items()
           if k in {x.strip() for x in _only.split(",")}}

SALT_THRESHOLD = 4096


def main() -> None:
    spark = get_spark("simhash-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    from shredder_spark.benchcontrol import GapControl
    from shredder_spark.operators.dedup import simhash_pairs

    ctl = GapControl(spark, per_gap=2, every=1)
    out: dict = {"metric": "simhash_decomposition",
                 "salt_threshold": SALT_THRESHOLD, "salts": 64,
                 "legs": {}}
    for sf, d in SF_DIRS.items():
        if not os.path.isdir(d):
            out["legs"][sf] = {"skipped": f"missing {d}"}
            continue
        docs = load_table(spark, d, "documents")
        stages: dict = {}
        pairs = simhash_pairs(docs, "doc_id", "text", max_distance=3,
                              salt_threshold=SALT_THRESHOLD,
                              _stages=stages)
        leg: dict = {"sf_dir": d}

        ctl.gap()
        t0 = time.time()
        leg["quads_rows"] = stages["quads"].count()
        leg["t_fingerprint_quads"] = round(time.time() - t0, 2)

        # bucket census over the persisted quads (cheap relative to
        # the joins; candidate volume = sum C(size,2) per bucket)
        sizes = (stages["quads"].groupBy("q", "qv")
                 .agg(F.count(F.lit(1)).alias("c")))
        c = F.col("c").cast("decimal(38,0)")
        cand = (c * (c - 1) / 2).cast("decimal(38,0)")
        hot = F.col("c") > SALT_THRESHOLD
        t0 = time.time()
        census = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot_buckets"),
            F.max(F.when(~hot, F.col("c"))).alias("max_cold_bucket"),
            F.max("c").alias("max_bucket"),
            F.sum(F.when(~hot, cand)).alias("cold_cand_volume"),
            F.sum(F.when(hot, cand)).alias("hot_cand_volume"),
            F.sum(F.when(hot, c)).alias("hot_quads"),
        ).collect()[0].asDict()
        leg["t_bucket_census"] = round(time.time() - t0, 2)
        leg["census"] = {k: (int(v) if v is not None else None)
                         for k, v in census.items()}

        ctl.gap()
        t0 = time.time()
        leg["cold_candidates"] = stages["cold_candidates"].count()
        leg["t_cold_join"] = round(time.time() - t0, 2)

        ctl.gap()
        t0 = time.time()
        leg["hot_candidates"] = stages["hot_candidates"].count()
        leg["t_hot_join"] = round(time.time() - t0, 2)

        ctl.gap()
        t0 = time.time()
        leg["pairs"] = pairs.count()
        leg["t_full_filtered"] = round(time.time() - t0, 2)
        ctl.gap()

        stages["quads"].unpersist()
        out["legs"][sf] = leg
        print(f"sf{sf}: {json.dumps(leg)}", file=sys.stderr)

    out["control"] = ctl.stamp()
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
