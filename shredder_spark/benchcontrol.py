"""Frozen in-session VM-speed control, shared by every artifact tool.

Cloud-VM throughput drifts between sessions (the round-4→5 "+9%
regression" was a VM phase, proven by the round-6 control). Any
committed number is only interpretable with the speed of the session
that produced it, so `bench.py`, `tools/oracle_sweep_full.py`, and
`tools/scale_sweep.py` all stamp their artifacts with the same
control: a FROZEN synthetic workload (range scan → modular projection
→ 97-group agg → running-sum window; one shuffle + one window, all
codegen, no parquet, no registry — immune to engine changes by
construction) and its pinned reference median.

`vs_ref = session control median / CONTROL_REF_S` is the session's
speed factor; divide raw timings by it for cross-round comparison.
DO NOT re-pin CONTROL_REF_S when a VM feels slow — that is exactly
the drift this exists to expose.
"""

from __future__ import annotations

import statistics
import time

# Pinned at the control's introduction (round 6, 2026-08-14,
# local[32], steady state, interleaved inside the full sf0.1 bench).
CONTROL_REF_S = 0.40


def drain(df) -> None:
    """Execute the full plan (no column-pruning shortcut, nothing
    collected to the driver)."""
    df.write.format("noop").mode("overwrite").save()


def control_once(spark) -> None:
    """One run of the frozen control workload."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = (spark.range(0, 20_000_000, 1, 32)
          .select((F.col("id") % 97).alias("k"),
                  (F.col("id") * 2654435761 % 1000003).alias("v")))
    agg = df.groupBy("k").agg(F.sum("v").alias("s"), F.avg("v").alias("a"),
                              F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    drain(agg.select("k", "s", "a", "c", F.sum("s").over(w).alias("rs")))


def control_stats(spark, reps: int = 5, warmup: int = 1) -> dict:
    """Timed control reps → artifact-stampable session-speed record."""
    for _ in range(warmup):
        control_once(spark)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        control_once(spark)
        times.append(round(time.perf_counter() - t0, 4))
    med = statistics.median(times)
    mean = statistics.fmean(times)
    return {
        "reps": times,
        "median": round(med, 4),
        "cv": round(statistics.pstdev(times) / mean if mean else 0.0, 4),
        "ref_s": CONTROL_REF_S,
        "vs_ref": round(med / CONTROL_REF_S, 4),
    }
