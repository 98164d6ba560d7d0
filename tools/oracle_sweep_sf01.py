"""One-shot: run the declared Q01-Q50 contract against DuckDB at sf0.1
(10x the driver's correctness gate) — evidence that oracle agreement
is not a small-sample artifact."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "16").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, osql = mod.queries(), mod.oracle_sql()
names = sorted(n for n in qs if n in osql)[:0] or [
    n for n in sorted(qs) if n.split("_")[0].lstrip("q0").isdigit()]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            str(round(v, 6)) if isinstance(v, float) else str(v)
            for v in r))
    return sorted(out)


declared = [n for n in sorted(qs)
            if n[1:3].isdigit() and int(n[1:3]) <= 50 and n in osql
            and (len(n) < 4 or not n[3].isdigit())]
fails = 0
for name in declared:
    try:
        s = qs[name](spark, SF).collect()
        o = con.execute(osql[name]).fetchall()
        ok = norm(s) == norm(o)
    except Exception as e:
        ok, o, s = False, [], []
        print(f"{name}: ERROR {str(e)[:80]}")
    if not ok:
        fails += 1
        print(f"{name}: MISMATCH rows {len(s)} vs {len(o)}")
print(f"checked {len(declared)} declared queries at sf0.1: "
      f"{len(declared) - fails} match, {fails} mismatch")
spark.stop()
