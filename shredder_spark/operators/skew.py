"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in this engine's session defaults)
handles most skew at runtime by splitting oversized partitions. These
helpers cover the cases AQE can't: a *single* hot key whose rows all
hash to one task in a sort-merge join, or a high-skew groupBy where
one reducer receives a large share of the input.

``salted_join`` replicates the (smaller) build side ``salt_n`` times —
once per salt value — and scatters the probe side uniformly over the
salt domain with a deterministic per-row hash, so the hot key's rows
spread across ``salt_n`` tasks. Semantics are exactly the plain
equi-join's (verified in tests); cost is build-side × salt_n.

``two_phase_agg`` pre-aggregates on (key, salt) then re-aggregates on
key — the manual map-side-combine pattern for aggregates Spark can't
partially compute itself (e.g. over a UDAF); for built-in aggregates
Spark's HashAggregate pair already does this and the helper is not
needed.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "_skew_salt"


def _probe_salt(df: DataFrame, salt_n: int) -> Column:
    """Deterministic uniform salt from a full-row hash (no RNG: retries
    and speculative tasks must salt a row identically)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_n))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    *,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side's hot keys scattered over
    ``salt_n`` sub-partitions and the build side replicated to match.

    Use when one probe-side key dominates and the build side is too
    large to broadcast but small enough to replicate ``salt_n``×.
    Supported ``how``: inner / left (semantics-preserving for both).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)

    p = probe.withColumn(_SALT, _probe_salt(probe, salt_n))
    b = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = p.join(b, keys + [_SALT], how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    *,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys, salt), phase 2 merges per key. ``aggs`` maps column →
    one of sum/count/min/max (the decomposable aggregates)."""
    merge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"non-decomposable aggregate {fn!r}")

    salted = df.withColumn(_SALT, _probe_salt(df, salt_n))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[getattr(F, fn)(c).alias(f"_p_{c}") for c, fn in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[getattr(F, merge[fn])(f"_p_{c}").alias(f"{fn}_{c}")
          for c, fn in aggs.items()]
    )
