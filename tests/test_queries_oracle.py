"""t2-style correctness: every declared query vs the DuckDB oracle.

Runs at sf0.001 by default for speed (the driver runs sf0.01); set
SHREDDER_TEST_SF_DIR to override.
"""

from __future__ import annotations

import os

import pytest

from shredder_spark import queries as q
from tests.oracle_utils import compare_query

SF_DIR = os.environ.get("SHREDDER_TEST_SF_DIR", "/root/testdata/sf0.001")

ALL = sorted(q.registry().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, name):
    query = q.registry()[name]
    if query.oracle is None:
        df = query.run(spark, SF_DIR)
        assert df.count() >= 0
        return
    problems = compare_query(spark, SF_DIR, query)
    assert not problems, f"{name}: " + "; ".join(problems)
