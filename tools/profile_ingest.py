"""Profile the fixed-width ingest path stage by stage (sf0.1 fixture).

Times successively richer plans over the same input so the delta
between rows isolates each cost: line split, byte slicing, numeric
casts, timestamp rebuild, full parse, avro encode+write.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from shredder_spark.session import get_spark
from shredder_spark.sources.ingest_bench import BENCH_SCHEMA, ensure_fixture
from shredder_spark.sources.fixedwidth import read_fixed_width
from shredder_spark.avro_schema import parse_avro_fixed_schema

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best:7.3f}s  {mb / best:8.1f} MB/s")
    return best


spark = get_spark()
man = ensure_fixture(spark, SF_DIR)
path, total_bytes = man["path"], man["bytes"]
mb = total_bytes / 1e6
fs = parse_avro_fixed_schema(BENCH_SCHEMA)
print(f"fixture: {mb:.0f} MB, {man['lines']} lines")

lines = spark.read.text(path, lineSep="\r\n")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm
noop(read_fixed_width(spark, path, BENCH_SCHEMA))

timeit("read+linesplit only", lambda: noop(lines))
timeit("read+octet_length agg", lambda: lines.select(F.sum(F.octet_length("value"))).collect())

bin_slices = lines.select(
    *[F.col("value").cast("binary").substr(start, f.length).cast("string").alias(f.name)
      for f, start in fs.field_offsets()]
)
timeit("byte-slice 30 cols (no cast)", lambda: noop(bin_slices))

char_slices = lines.select(
    *[F.substring("value", start, f.length).alias(f.name)
      for f, start in fs.field_offsets()]
)
timeit("char-slice 30 cols (no cast)", lambda: noop(char_slices))

# full parse minus timestamps
no_ts = [f for f in fs.fields if f.type_name not in ("timestamp-millis", "timestamp-micros", "date")]
from shredder_spark.sources.fixedwidth import _cast_expr, _slice_expr
no_ts_df = lines.select(
    *[_cast_expr(f, _slice_expr(F.col("value"), start, f.length)).alias(f.name)
      for f, start in fs.field_offsets() if f.type_name not in ("timestamp-millis", "timestamp-micros", "date")]
)
timeit("full parse minus 3 ts cols", lambda: noop(no_ts_df))

full = read_fixed_width(spark, path, BENCH_SCHEMA)
timeit("full parse (current)", lambda: noop(full))

from shredder_spark.sinks.avro import AVRO_FORMAT, have_spark_avro
from shredder_spark.sources.ingest_bench import BENCH_BASE
avro_out = os.path.join(BENCH_BASE, "avro_prof")
if have_spark_avro(spark):
    timeit("parse+avro snappy write", lambda: (
        read_fixed_width(spark, path, BENCH_SCHEMA)
        .write.format(AVRO_FORMAT).option("compression", "snappy")
        .mode("overwrite").save(avro_out)))
    timeit("parse+avro uncompressed", lambda: (
        read_fixed_width(spark, path, BENCH_SCHEMA)
        .write.format(AVRO_FORMAT).option("compression", "uncompressed")
        .mode("overwrite").save(avro_out)))
    timeit("parse+parquet snappy (control)", lambda: (
        read_fixed_width(spark, path, BENCH_SCHEMA)
        .write.mode("overwrite").parquet(avro_out)))
spark.stop()
