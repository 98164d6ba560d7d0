"""Adversarial degenerate-embeddings fixture: every embeddings-touching
oracle pair vs DuckDB on a small corpus of edge-case vectors.

Why this exists: the degenerate-DOCUMENTS fixture caught the whole
descending-SEQUENCE family that shipped broken to sf1; this is the same
guard for the embedding column. The driver corpora contain only
well-formed unit-ish vectors, so zero-norm vectors (cosine undefined),
vectors that quantize to zero at the registry's ROUND(x*10000) scale,
exact duplicates, antipodal pairs (cosine -1), empty arrays, and NULL
embeddings/labels were structurally untested — and zero-norm vectors DID
break similarity tiers once already (round 7: NaN sims rank first under
DESC). Any engine/oracle divergence on these rows becomes a unit-test
failure instead of a scale-audit finding.

Magnitudes stay <= 100 by design: at the registry's x10000 quantization
a 1e5-magnitude element squares to 1e18 per term, and a 64-dim SUM
overflows int64 — where DuckDB silently widens SUM(BIGINT) to HUGEINT
and Spark does not, so huge inputs would test integer-width policy, not
the operators. Documented here as the boundary of the contract.

Non-embeddings tables are symlinked from sf0.001 so cross-table joins
still run. Both-empty results are accepted (the point is "no throw, no
phantom rows, engine == oracle", not non-triviality).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shredder_spark import queries as q
from shredder_spark.catalog import TABLES
from tests.oracle_utils import compare_query

SF_BASE = "/root/testdata/sf0.001"
DIM = 64


def _vec(i: int) -> list[float]:
    # deterministic, varied, in [-1, 1] — no RNG, no import-order traps
    return [((i * 31 + j * 17) % 21 - 10) / 10.0 for j in range(DIM)]


def degenerate_embeddings() -> list[tuple]:
    rows: list[tuple] = []
    # vec_id 0 is the query anchor used by every top-k query: keep it
    # normal so those queries stay non-vacuous on this corpus
    for i in range(10):
        rows.append((i, _vec(i), i % 6))
    rows += [
        (10, [0.0] * DIM, 0),                    # zero vector: cosine undefined
        (11, [1e-9] * DIM, 1),                   # quantizes to the zero vector
        (12, _vec(1), 2),                        # exact duplicate of vec 1
        (13, [-x for x in _vec(1)], 3),          # antipode of vec 1: cosine -1
        (14, [100.0] * DIM, 4),                  # large but inside int64 dots
        (15, [0.0] * (DIM - 1) + [1.0], 5),      # single nonzero element
        (16, [], 0),                             # empty array
        (17, None, 1),                           # NULL embedding
        (18, _vec(18), None),                    # NULL label
    ]
    return rows


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_emb_sf")
    for t in TABLES:
        if t == "embeddings":
            continue
        os.symlink(f"{SF_BASE}/{t}.parquet", str(d / f"{t}.parquet"))
    rows = degenerate_embeddings()
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def _embeddings_touching_paired():
    names = []
    for name, query in sorted(q.registry().items()):
        if query.oracle is None:
            continue
        texts = (getattr(query, "engine_sql", None) or "") + query.oracle
        if re.search(r"\bembeddings\b", texts):
            names.append(name)
    return names


EMB_QUERIES = _embeddings_touching_paired()


def test_fixture_covers_the_family():
    assert len(EMB_QUERIES) >= 20, len(EMB_QUERIES)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embeddings_query_on_degenerate_corpus(spark, degenerate_sf_dir, name):
    query = q.registry()[name]
    problems = compare_query(spark, degenerate_sf_dir, query)
    problems = [p for p in problems if "empty result on both sides" not in p]
    assert not problems, f"{name}: " + "; ".join(problems)
