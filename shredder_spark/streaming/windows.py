"""Streaming window aggregations (SURVEY B55–B57).

One definition serves both modes: ``window``/``session_window`` are
plain Catalyst expressions, so the same builder runs in batch (the
DuckDB-oracle gate) and under ``readStream`` (the behavioral tests).
Structured Streaming's incremental execution converges to the batch
answer — that equivalence IS the oracle (SURVEY §2.3 B.4).

Scale posture: windowed aggs shuffle on (window, keys); with a
watermark the state store evicts closed windows, so state is bounded
by (watermark horizon / slide) × key cardinality, not by stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(events: DataFrame, window_size: str = "1 hour") -> DataFrame:
    """Per (window, event_type) count + value sum (oracle: Q44)."""
    return (
        events.groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("win.start").alias("w"), "event_type", "c", "s")
    )


def sliding_counts(events: DataFrame, size: str = "10 minutes",
                   slide: str = "5 minutes") -> DataFrame:
    """Sliding-window counts (oracle: Q45)."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("win"))
        .agg(F.count("*").alias("c"))
        .select(F.col("win.start").alias("w"), "c")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap (B57).

    Note the half-open-interval tie semantics: an event exactly ``gap``
    after the previous one starts a NEW session (Spark merges only when
    ts < previous end). The SQL gaps-and-islands oracle (Q46) uses
    ``> gap`` — equivalent except exact-tie gaps, which the test data
    avoids (sub-second timestamps).
    """
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(F.count("*").alias("n"), F.min("ts").alias("s_start"),
             F.max("ts").alias("s_end"))
        .select("user_id", "s_start", "s_end", "n")
    )


def as_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP; testdata parquet may surface
    TIMESTAMP_NTZ. Under the UTC session timezone the cast is
    value-preserving, so normalize before attaching event-time ops."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return as_event_time(events).withWatermark("ts", delay)
