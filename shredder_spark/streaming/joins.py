"""Streaming joins (extends B61's stream-static to stream-stream).

Stream-stream inner joins in Structured Streaming require (a) an
equality key, (b) an event-time interval bounding how far apart
matching rows can be, and (c) watermarks on both sides — together they
bound the join state: each side buffers only rows younger than
(watermark + interval). Without the interval the state is unbounded
and the query is rejected. Batch equivalence (the same join condition
as a plain batch join) is the oracle, as with every streaming op here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 day",
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Inner join: right rows within ``[left_ts - lookback, left_ts]``
    for the same key. ``streaming=False`` runs the identical condition
    as a batch join (the oracle)."""
    from shredder_spark.streaming.windows import as_event_time

    l, r = as_event_time(left, left_ts), as_event_time(right, right_ts)
    if streaming:
        l = l.withWatermark(left_ts, watermark)
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, "inner")
