"""Source/sink format round-trips beyond parquet+avro (SURVEY B3):
CSV, line-delimited JSON, and ORC write -> read -> identical rows.

Schema fidelity differs by format on purpose:
- ORC is typed: read back with no hints, schemas must match exactly.
- CSV/JSON are text: read back with the writer's schema (the production
  pattern at 100 TB - schema-on-read from a catalog, never inference).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from shredder_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df, keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def _roundtrip(spark, tmp_path, fmt, reader_opts=None, with_schema=True):
    src = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / f"rt_{fmt}")
    (src.write.format(fmt).mode("overwrite")
        .options(**({"header": "true"} if fmt == "csv" else {}))
        .save(path))
    reader = spark.read.format(fmt).options(**(reader_opts or {}))
    if with_schema:
        reader = reader.schema(src.schema)
    got = reader.load(path)
    assert got.schema == src.schema
    assert _sorted_rows(got, ["c_custkey"]) == _sorted_rows(src, ["c_custkey"])


def test_csv_roundtrip(spark, tmp_path):
    _roundtrip(spark, tmp_path, "csv", reader_opts={"header": "true"})


def test_json_roundtrip(spark, tmp_path):
    _roundtrip(spark, tmp_path, "json")


def test_orc_roundtrip(spark, tmp_path):
    # ORC carries its own types - no schema hint on read.
    _roundtrip(spark, tmp_path, "orc", with_schema=False)


def test_orc_predicate_pushdown(spark, tmp_path):
    """The ORC scan must push filters like the parquet path does."""
    src = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "orc_pd")
    src.write.format("orc").mode("overwrite").save(path)
    df = spark.read.format("orc").load(path).filter(F.col("c_custkey") < 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_custkey" in plan.split("PushedFilters")[1][:120]
    assert df.count() == src.filter("c_custkey < 10").count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: batches written with different (compatible)
    schemas union under mergeSchema — late columns surface as NULL in
    old files (the 100 TB reality: schemas drift across years of
    files)."""
    p = str(tmp_path / "evolve")
    base = load_table(spark, SF_DIR, "region").select("r_regionkey", "r_name")
    base.write.mode("append").parquet(p)
    extended = (load_table(spark, SF_DIR, "region")
                .select("r_regionkey", "r_name")
                .withColumn("score", F.col("r_regionkey") * 10))
    extended.write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"r_regionkey", "r_name", "score"}
    assert merged.count() == base.count() * 2
    # old-file rows carry NULL score; new-file rows carry values
    assert merged.filter(F.col("score").isNull()).count() == base.count()


def test_json_corrupt_record_quarantine(spark, tmp_path):
    """B8 for JSON: PERMISSIVE mode routes unparseable lines to
    _corrupt_record instead of failing the job — the quarantine
    pattern the fixed-width reader implements natively."""
    p = tmp_path / "messy.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n'
                 'not json at all\n'
                 '{"a": 2, "b": "y"}\n'
                 '{"a": "NaN-ish", "b": 3}\n')
    df = (spark.read
          .schema("a INT, b STRING, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(str(p)))
    # Spark disallows lazily querying only the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize first, the
    # documented pattern
    df = df.cache()
    df.count()
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert clean.count() == 2 and bad.count() == 2
    assert sorted(r.a for r in clean.collect()) == [1, 2]
    # the raw offending line is preserved for repair/audit
    assert any("not json" in r._corrupt_record for r in bad.collect())
