"""Force the pure-Python OCF sink/source path (used when no spark-avro
class is deployable) and check parity with the JVM path."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F
import pytest

from shredder_spark.sinks import avro as avro_sink


@pytest.fixture()
def no_jvm_avro(monkeypatch):
    monkeypatch.setattr(avro_sink, "have_spark_avro", lambda spark: False)


def _sample(spark):
    return spark.range(300).select(
        F.col("id").alias("k"),
        F.concat(F.lit("r"), F.col("id")).alias("s"),
        (F.col("id") / 7.0).alias("x"),
        F.timestamp_micros(F.col("id") * 1_000_003).alias("ts"),
        F.date_add(F.lit("1999-12-31").cast("date"), F.col("id").cast("int")).alias("d"),
    ).repartition(3)


def test_python_ocf_roundtrip(spark, tmp_path, no_jvm_avro):
    df = _sample(spark)
    out = str(tmp_path / "pyocf")
    n = avro_sink.write_avro_ocf(df, out, codec="snappy")
    assert n == 300
    files = glob.glob(out + "/*.avro")
    assert len(files) == 3  # one file per partition, reference A24
    back = avro_sink.read_avro_ocf(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_python_written_readable_by_jvm(spark, tmp_path, monkeypatch):
    """Cross-check: files from the from-scratch codec must be readable by
    the JVM avro reader — proves spec compliance, not just self-consistency."""
    df = _sample(spark)
    out = str(tmp_path / "pyocf2")
    monkeypatch.setattr(avro_sink, "have_spark_avro", lambda spark: False)
    avro_sink.write_avro_ocf(df, out, codec="snappy")
    monkeypatch.undo()
    if not avro_sink.have_spark_avro(spark):
        pytest.skip("no JVM avro available")
    back = spark.read.format(avro_sink.AVRO_FORMAT).load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jvm_written_readable_by_python(spark, tmp_path, monkeypatch):
    df = _sample(spark)
    out = str(tmp_path / "jvmocf")
    if not avro_sink.have_spark_avro(spark):
        pytest.skip("no JVM avro available")
    avro_sink.write_avro_ocf(df, out, codec="snappy")
    monkeypatch.setattr(avro_sink, "have_spark_avro", lambda spark: False)
    back = avro_sink.read_avro_ocf(spark, out, schema=None)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
