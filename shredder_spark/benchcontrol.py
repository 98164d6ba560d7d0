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


class GapControl:
    """Bracketing control gaps for long multi-query tools (round-8
    verdict "what's wrong" #2: the profile/sweep artifacts carried the
    noisiest stamps in the repo because they ran one 5-rep control at
    the END of a multi-hour run — a VM phase anywhere inside the run
    was invisible).

    Usage: call ``maybe_gap()`` at every query boundary (it runs a
    control gap every ``every``-th call, so a 688-query profile pays
    ~2·⌈688/25⌉ control reps, not 1376); record ``gap_index()`` next
    to each timing; normalize with ``local_vs_ref(gi)`` (the median of
    the gap before and the gap after, over the pinned reference);
    stamp the artifact with ``stamp()`` — a 20 %-trimmed core over ALL
    gap reps, the same instrument bench.py ships."""

    def __init__(self, spark, per_gap: int = 2, trim_frac: float = 0.2,
                 every: int = 1):
        self.spark = spark
        self.per_gap = per_gap
        self.trim_frac = trim_frac
        self.every = every
        self.gaps: list[list[float]] = []
        self._calls = 0

    def gap(self) -> None:
        g = []
        for _ in range(self.per_gap):
            t0 = time.perf_counter()
            control_once(self.spark)
            g.append(round(time.perf_counter() - t0, 4))
        self.gaps.append(g)

    def maybe_gap(self) -> None:
        if self._calls % self.every == 0:
            self.gap()
        self._calls += 1

    def gap_index(self) -> int:
        return len(self.gaps) - 1

    def local_vs_ref(self, gi: int) -> float:
        """Session-speed factor local to a timing bracketed by gap
        ``gi`` (before) and gap ``gi+1`` (after, when it exists)."""
        local = list(self.gaps[gi])
        if gi + 1 < len(self.gaps):
            local += self.gaps[gi + 1]
        med = statistics.median(local)
        return med / CONTROL_REF_S if med else 1.0

    def stamp(self) -> dict:
        reps = [t for g in self.gaps for t in g]
        if not reps:
            # same key set as the populated branch: artifact consumers
            # keying on reps_n / vs_ref must not see a shape change
            # when no gaps ran (r9 advice)
            return {"reps_n": 0, "gaps_n": 0, "per_gap": self.per_gap,
                    "every": self.every, "median": None, "cv": None,
                    "cv_raw": None, "trim_frac": self.trim_frac,
                    "ref_s": CONTROL_REF_S, "vs_ref": None}
        s = sorted(reps)
        k = int(len(s) * self.trim_frac)
        core = s[k:len(s) - k] or s
        med = statistics.median(core)
        mean = statistics.fmean(core)
        raw_mean = statistics.fmean(reps)
        return {
            "reps_n": len(reps),
            "gaps_n": len(self.gaps),
            "per_gap": self.per_gap,
            "every": self.every,
            "median": round(med, 4),
            "cv": round(statistics.pstdev(core) / mean if mean else 0.0, 4),
            "cv_raw": round(statistics.pstdev(reps) / raw_mean
                            if raw_mean else 0.0, 4),
            "trim_frac": self.trim_frac,
            "ref_s": CONTROL_REF_S,
            "vs_ref": round(med / CONTROL_REF_S, 4),
        }


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
