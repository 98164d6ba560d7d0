"""Stateful streaming operators (SURVEY B59/B60/B61).

- ``dedup_stream``: drop duplicate event ids across micro-batches —
  Spark keeps seen keys in the state store; with a watermark the state
  is bounded by the late horizon (the 100 TB requirement — unbounded
  key memory is the naive failure mode).
- ``running_counts_stateful``: arbitrary per-key state via
  ``applyInPandasWithState`` (the one place the engine owns streaming
  state directly — everything else rides built-in operators).
- ``stream_static_join``: stream joined to a broadcast static dim.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from shredder_spark.utils import ensure_package_on_executors


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str | None = None) -> DataFrame:
    keys = keys or ["event_id"]
    if watermark:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


_COUNT_STATE = StructType([StructField("n", LongType())])
_COUNT_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n", LongType()),
])


def _count_fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n]})


def running_counts_stateful(events: DataFrame) -> DataFrame:
    """Per-user running event count with explicit state (B60). Emits the
    current total every micro-batch; the final emission per key equals
    the batch groupBy count (oracle Q48)."""
    ensure_package_on_executors(events.sparkSession)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _count_fn,
            outputStructType=_COUNT_OUT,
            stateStructType=_COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_static_join(events: DataFrame, static_dim: DataFrame,
                       on_left: str = "user_id", on_right: str = "c_custkey") -> DataFrame:
    """Stream-static equi-join (B61); the static side is broadcast so no
    stream-side shuffle and no state store involvement."""
    return events.join(
        F.broadcast(static_dim), F.col(on_left) == F.col(on_right), "inner")
