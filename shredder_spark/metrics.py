"""Pipeline metrics (reference A30 parity, Spark-native).

The reference prints a perf report after each run — wall time, bytes/s,
lines/s, per-stage durations summed across chunks
(`fixed2avro/Util.go:66-86`, accumulation `ColumnBuilder.go:178-193`).
The Spark-native equivalent is the ``Dataset.observe`` API: named
aggregate metrics are computed *inside* the job (piggybacking on the
existing pass, exactly like the reference's per-chunk accumulation —
no second scan, no collect) and surface on the driver after the
action. At 1000 executors the aggregation is the same tree-reduce
every aggregate uses.

``ObservedIngest`` wraps a DataFrame with row/byte counters and a wall
clock, and renders a reference-style report line.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


@dataclass
class IngestReport:
    rows: int
    chars: int
    wall_s: float

    @property
    def lines_per_s(self) -> float:
        return self.rows / self.wall_s if self.wall_s else 0.0

    @property
    def mb_per_s(self) -> float:
        return self.chars / 1e6 / self.wall_s if self.wall_s else 0.0

    def render(self) -> str:
        """Reference-style report (`Util.go:66-86` prints the same
        three: total time, bytes/s, lines/s)."""
        return (f"rows={self.rows} chars={self.chars} wall={self.wall_s:.3f}s "
                f"rate={self.mb_per_s:.1f}MB/s lines={self.lines_per_s / 1e6:.2f}M/s")


class ObservedIngest:
    """Attach observe() counters to a typed DataFrame, then run any
    action/sink through :meth:`time`; metrics are collected from the
    same job."""

    def __init__(self, df: DataFrame, *, size_col: str | None = None):
        self._obs = Observation("ingest")
        metrics = [F.count(F.lit(1)).alias("rows")]
        metrics.append(
            F.sum(F.length(size_col)).alias("chars") if size_col
            else F.lit(0).alias("chars"))
        self.df = df.observe(self._obs, *metrics)

    def time(self, action) -> IngestReport:
        t0 = time.perf_counter()
        action(self.df)
        wall = time.perf_counter() - t0
        got = self._obs.get
        return IngestReport(rows=got["rows"], chars=int(got["chars"] or 0),
                            wall_s=wall)
