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


@pytest.mark.parametrize("name", [
    "q02_projection", "q05_inner_join", "q15_pricing_summary",
    "q21_ranking_windows", "q24_sort_nulls", "q30_string_fns",
    "q31_datetime_fns", "q37_json_extract", "q176_array_batch5",
])
def test_arrow_compare_path_agrees_with_row_path(spark, name):
    """The vectorized Arrow compare (engaged for >50k-row results so
    full-registry sf1 sweeps are tractable) must return the same
    verdict as the row-at-a-time tolerant compare on representative
    shapes: floats, dates/timestamps, NULL ordering, JSON strings,
    empty strings. Forcing the threshold to 10 routes these sf0.001
    queries through the Arrow path (or its unsupported-type fallback)."""
    import tests.oracle_utils as OU

    query = q.registry()[name]
    orig = OU.ARROW_COMPARE_THRESHOLD
    try:
        OU.ARROW_COMPARE_THRESHOLD = 10
        fast = compare_query(spark, SF_DIR, query)
    finally:
        OU.ARROW_COMPARE_THRESHOLD = orig
    slow = compare_query(spark, SF_DIR, query)
    assert (not fast) == (not slow), f"fast={fast[:2]} slow={slow[:2]}"
