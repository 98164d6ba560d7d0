"""Incremental aggregate maintenance (materialized-rollup algebra).

At 100 TB you never recompute a corpus rollup because one day of data
arrived: you aggregate the delta and MERGE partial states. This
operator encodes the mergeable-state algebra for the common aggregate
families:

- additive (count, sum): partials add;
- extremal (min, max): partials fold with least/greatest;
- derived (avg, ratios): re-derive from merged sums — never merge
  averages directly.

The same algebra is why map-side partial aggregation works at all;
here it's lifted to *table-level* reuse (yesterday's rollup table +
today's delta → today's rollup, no base rescan). Verified by q310
against a full-recompute oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_rollups(
    base: DataFrame,
    delta: DataFrame,
    *,
    keys: list[str],
    add_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Merge two partial rollups with identical schemas over ``keys``.

    Keys present in only one side pass through (full-outer union
    semantics — a brand-new group in the delta simply appears).
    """
    cols = list(add_cols) + list(min_cols) + list(max_cols)
    u = base.select(*keys, *cols).unionByName(delta.select(*keys, *cols))
    aggs = (
        [F.sum(c).alias(c) for c in add_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return u.groupBy(*keys).agg(*aggs)
