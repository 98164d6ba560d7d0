"""Pin schema-cache invalidation (r12 verdict What's wrong #5 /
ADVICE medium): a fixture parquet regenerated IN PLACE with a
different schema must be re-inferred, not served the stale cached
schema (or stale nanos-column set)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from shredder_spark.catalog import load_table


def _write(path: str, table: pa.Table, mtime: float) -> None:
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_schema_cache_invalidates_on_replace(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "widget.parquet")
    _write(path, pa.table({"a": pa.array([1, 2], pa.int64())}), 1_000_000.0)
    df1 = load_table(spark, sf_dir, "widget")
    assert [f.name for f in df1.schema.fields] == ["a"]

    # regenerate in place: new column set, distinct mtime
    _write(path, pa.table({"a": pa.array([3], pa.int64()),
                           "b": pa.array(["x"], pa.string())}), 2_000_000.0)
    df2 = load_table(spark, sf_dir, "widget")
    assert [f.name for f in df2.schema.fields] == ["a", "b"]
    assert df2.count() == 1


def test_nanos_cols_invalidate_on_replace(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "tick.parquet")
    # v1: plain long column — no nanos rewrite
    _write(path, pa.table({"ts": pa.array([1, 2], pa.int64())}), 1_000_000.0)
    df1 = load_table(spark, sf_dir, "tick")
    assert dict(df1.dtypes)["ts"] == "bigint"

    # v2: TIMESTAMP(NANOS) column — must be detected and rebuilt as a
    # timestamp, which only happens if _nanos_timestamp_cols re-reads
    _write(path, pa.table({"ts": pa.array([1_700_000_000_000_000_000],
                                          pa.timestamp("ns"))}),
           2_000_000.0)
    df2 = load_table(spark, sf_dir, "tick")
    assert dict(df2.dtypes)["ts"].startswith("timestamp")
    assert df2.count() == 1
