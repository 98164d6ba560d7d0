"""Quiet-box control stamp for sharded runs (r9 verdict task 5).

Concurrent sweep/profile shards contend with each other, so any
control gap measured INSIDE a shard reads high (r8/r9 pooled stamps:
cv 0.25-0.26 vs the <=0.15 target). The honest quiet-box reference
for a sharded artifact is measured when the box is actually quiet:
once BEFORE the shards launch and once AFTER they all join.

    python tools/quiet_control.py /tmp/ctl_pre.json
    ... launch k shards, wait ...
    python tools/quiet_control.py /tmp/ctl_post.json
    python tools/merge_sweep_shards.py OUT.json shard*.json \
        --quiet /tmp/ctl_pre.json /tmp/ctl_post.json

Spins up a minimal local[32] session (same thread count bench.py
stamps with), runs the frozen control (1 warmup + 5 reps), writes the
control_stats record tagged with a wall-clock timestamp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from shredder_spark.benchcontrol import control_stats


def main() -> None:
    out_path = sys.argv[1]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rec = control_stats(spark, reps=5, warmup=1)
    rec["wall_unix"] = round(time.time(), 1)
    with open(out_path, "w") as fh:
        json.dump(rec, fh)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
