"""Adversarial degenerate-events fixture: every events-touching oracle
pair vs DuckDB on a small corpus of edge-case event streams.

Third leg of the adversarial-fixture family (documents round 7a,
embeddings round 7b): the driver events table is well-formed — strictly
increasing microsecond timestamps, valid one-key JSON props, non-NULL
everything, 5 known event types — so the entire bug class of real event
feeds was structurally untested:

- timestamp TIES (two events, same microsecond): any rank/sequence
  query whose window orders by ts alone becomes nondeterministic, and
  the two engines are free to disagree;
- single-event users (sessionization/funnel minimum);
- NULL and malformed and empty-object JSON props (Spark's
  get_json_object returns NULL on malformed input; DuckDB's
  json_extract THROWS — oracle texts must guard);
- NULL value / NULL event_type / NULL user_id rows;
- duplicate event_id (at-least-once delivery);
- midnight/month-boundary timestamps (date-bucket edges).

Deliberately NOT included: NULL ts. Event-time null is an ingest
reject in this engine (the fixed-width source quarantines bad records,
A31/B8) — the declared contract is ts NOT NULL after ingest, because
every engine pair orders NULLs differently (Spark ASC = NULLS FIRST,
DuckDB ASC = NULLS LAST) and silently re-ranking a whole stream on a
malformed row is worse than rejecting the row loudly.

Non-events tables are symlinked from sf0.001. Both-empty results are
accepted (the check is "no throw, no phantom rows, engine == oracle").
"""

from __future__ import annotations

import datetime as dt
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shredder_spark import queries as q
from shredder_spark.catalog import TABLES
from tests.oracle_utils import compare_query

SF_BASE = "/root/testdata/sf0.001"


def _ts(day: int, h: int = 0, m: int = 0, s: int = 0, us: int = 0):
    return dt.datetime(2024, 1, day, h, m, s, us)


def degenerate_events() -> list[tuple]:
    """(event_id, ts, user_id, event_type, value, props)"""
    rows = [
        # user 0: single event ever (sessionization minimum)
        (0, _ts(1, 9), 0, "view", 10.0, '{"k": 1}'),
        # user 1: EXACT timestamp tie, different types — rank queries
        # must tie-break deterministically or aggregate tie-invariantly
        (1, _ts(2, 10, 0, 0, 500), 1, "click", 5.0, '{"k": 2}'),
        (2, _ts(2, 10, 0, 0, 500), 1, "view", 6.0, '{"k": 3}'),
        # user 2: same second, distinct micros (sub-second ordering)
        (3, _ts(3, 11, 0, 1, 1), 2, "signup", 1.0, '{"k": 4}'),
        (4, _ts(3, 11, 0, 1, 2), 2, "purchase", 99.0, '{"k": 5}'),
        # user 3: full ordered funnel + trailing error
        (5, _ts(4, 8), 3, "signup", 0.5, '{"k": 6}'),
        (6, _ts(4, 9), 3, "view", 1.5, '{"k": 7}'),
        (7, _ts(4, 10), 3, "click", 2.5, '{"k": 8}'),
        (8, _ts(4, 11), 3, "purchase", 250.0, '{"k": 9}'),
        (9, _ts(4, 12), 3, "error", 0.0, '{"k": 10}'),
        # user 4: funnel OUT of order (purchase before signup)
        (10, _ts(5, 8), 4, "purchase", 75.0, '{"k": 11}'),
        (11, _ts(5, 9), 4, "signup", 0.0, '{"k": 12}'),
        # user 5: JSON pathology — NULL, empty object, malformed, empty
        (12, _ts(6, 8), 5, "click", 3.0, None),
        (13, _ts(6, 9), 5, "click", 4.0, "{}"),
        (14, _ts(6, 10), 5, "click", 5.0, "not json"),
        (15, _ts(6, 11), 5, "click", 6.0, ""),
        # user 6: value pathology — NULL, zero, negative
        (16, _ts(7, 8), 6, "purchase", None, '{"k": 13}'),
        (17, _ts(7, 9), 6, "purchase", 0.0, '{"k": 14}'),
        (18, _ts(7, 10), 6, "purchase", -12.5, '{"k": 15}'),
        # user 7: event_type pathology — NULL and empty string
        (19, _ts(8, 8), 7, None, 1.0, '{"k": 16}'),
        (20, _ts(8, 9), 7, "", 2.0, '{"k": 17}'),
        # duplicate event_id (at-least-once delivery), distinct ts
        (21, _ts(9, 8), 8, "view", 7.0, '{"k": 18}'),
        (21, _ts(9, 9), 8, "view", 7.0, '{"k": 18}'),
        # NULL user_id (anonymous event)
        (22, _ts(10, 8), None, "click", 8.0, '{"k": 19}'),
        # date-bucket edges: exact midnight + month boundary
        (23, _ts(11, 0, 0, 0, 0), 9, "view", 9.0, '{"k": 20}'),
        (24, dt.datetime(2024, 1, 31, 23, 59, 59, 999999), 9, "click",
         10.0, '{"k": 21}'),
        # user 10: spaced events with >30min gaps (multi-session shape)
        (25, _ts(12, 8, 0), 10, "signup", 1.0, '{"k": 22}'),
        (26, _ts(12, 8, 10), 10, "view", 2.0, '{"k": 23}'),
        (27, _ts(12, 9, 30), 10, "click", 3.0, '{"k": 24}'),
        (28, _ts(12, 11, 0), 10, "purchase", 150.0, '{"k": 25}'),
        (29, _ts(13, 11, 0), 10, "view", 4.0, '{"k": 26}'),
    ]
    return rows


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_ev_sf")
    for t in TABLES:
        if t == "events":
            continue
        os.symlink(f"{SF_BASE}/{t}.parquet", str(d / f"{t}.parquet"))
    rows = degenerate_events()
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def _events_touching_paired():
    names = []
    for name, query in sorted(q.registry().items()):
        if query.oracle is None:
            continue
        texts = (getattr(query, "engine_sql", None) or "") + query.oracle
        if re.search(r"\bevents\b", texts):
            names.append(name)
    return names


EV_QUERIES = _events_touching_paired()


def test_fixture_covers_the_family():
    assert len(EV_QUERIES) >= 90, len(EV_QUERIES)


@pytest.mark.parametrize("name", EV_QUERIES)
def test_events_query_on_degenerate_corpus(spark, degenerate_sf_dir, name):
    query = q.registry()[name]
    problems = compare_query(spark, degenerate_sf_dir, query)
    problems = [p for p in problems if "empty result on both sides" not in p]
    assert not problems, f"{name}: " + "; ".join(problems)
