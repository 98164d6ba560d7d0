"""As-of join (latest-at-or-before match), scalable formulation.

The declared Q14 formulation (SURVEY.md B21) uses a broadcast range
join + re-aggregate — fine when one side is small, O(candidate pairs)
otherwise. This operator is the scale path: the classic union trick.

    tag left probe rows and right reference rows, union them on
    (key, ts), then one window per key ordered by (ts, side) carries
    the latest reference values forward with
    ``last(col, ignoreNulls=True)``.

Cost: ONE hash shuffle of (|L| + |R|) rows on the join key plus a
per-partition sort — no pair blow-up, no broadcast requirement, skew
handled by AQE like any other window. This is the plan you want at
100 TB when both sides are fact-sized (the reference engine has no
join at all; this is north-star surface).

Semantics: for each left row, values from the right row with the
greatest ``right_ts`` satisfying ``right_ts <= left_ts`` (strict ``<``
when ``allow_exact_matches=False``) within the same key group —
pandas ``merge_asof(direction="backward")`` semantics; unmatched left
rows keep nulls.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "_asof_side"  # 0 = right (reference), 1 = left (probe)
_TS = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Left as-of join: ``left`` keeps all rows and gains ``right_cols``
    from the latest ``right`` row at-or-before (or strictly before,
    with ``allow_exact_matches=False``) its timestamp, per key.

    Key columns in ``on`` must exist under the same name in both
    inputs; ``right_cols`` must not collide with left column names
    (alias beforehand — include an alias of ``right_ts`` there if the
    matched timestamp itself is wanted).
    """
    keys = [on] if isinstance(on, str) else list(on)
    for c in right_cols:
        if c in left.columns:
            raise ValueError(f"right col {c!r} collides with a left column")

    lhs = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    rhs = right.select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *right_cols,
    )
    unioned = lhs.unionByName(rhs)

    # exact ties: right rows sort before left iff exact matches count
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left.columns,
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)


def asof_join_single_source(
    df: DataFrame,
    on: str | Sequence[str],
    *,
    ts: str,
    probe_pred,
    ref_pred,
    probe_cols: Sequence[str],
    right_cols: dict,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Single-scan specialization of :func:`asof_join` for the common
    case where BOTH sides are filters of the SAME relation (r12, guide
    §2.3/§2.4: the generic operator unions two filtered subtrees,
    scanning the source TWICE; when probe and reference rows live in
    one table, the identical union frame is one conditional projection
    over ONE scan — half the read I/O at any scale, same one-shuffle
    window afterwards).

    ``probe_pred`` / ``ref_pred`` are disjoint boolean Columns over
    ``df``; ``probe_cols`` are the left-side output columns (nulled on
    reference rows, key columns always kept); ``right_cols`` maps
    output name -> Column evaluated on reference rows (nulled on probe
    rows). Row-level equivalence to ``asof_join(df.filter(probe_pred)
    …, df.filter(ref_pred) …)`` is pinned in tests/test_asof.py."""
    keys = [on] if isinstance(on, str) else list(on)
    unioned = df.filter(probe_pred | ref_pred).select(
        *[(F.col(c) if c in keys
           else F.when(probe_pred, F.col(c)).alias(c))
          for c in probe_cols],
        F.col(ts).alias(_TS),
        F.when(probe_pred, F.lit(1)).otherwise(F.lit(0)).alias(_SIDE),
        *[F.when(ref_pred, expr).alias(name)
          for name, expr in right_cols.items()],
    )
    side_order = (F.col(_SIDE).asc() if allow_exact_matches
                  else F.col(_SIDE).desc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *probe_cols,
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
