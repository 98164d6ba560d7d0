"""Native XML file source (Spark 4) + Arrow interchange surface.

XML joins the CSV/JSON/ORC round-trip family (test_sources_roundtrip):
write rows as an XML document, read back with ``rowTag`` + explicit
schema, identical rows. ``df.toArrow()`` covers the zero-copy driver
hand-off added in Spark 4 — the boundary a pandas/polars consumer or a
local model-training loop uses to pull a (bounded!) result set.
"""

from __future__ import annotations

import pyarrow as pa
import pyspark.sql.functions as F

from shredder_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_xml_roundtrip(spark, tmp_path):
    src = (load_table(spark, SF_DIR, "nation")
           .select("n_nationkey", "n_name", "n_regionkey"))
    path = str(tmp_path / "xml_rt")
    (src.write.format("xml").option("rowTag", "nation")
        .mode("overwrite").save(path))
    back = (spark.read.format("xml").option("rowTag", "nation")
            .schema(src.schema).load(path))
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in src.collect())


def test_xml_attribute_and_nested(spark, tmp_path):
    # attributes surface as _attr columns; nested elements as structs
    doc = """<rows>
      <row id="1"><name>alpha</name><geo><lat>1.5</lat></geo></row>
      <row id="2"><name>beta</name><geo><lat>-2.25</lat></geo></row>
    </rows>"""
    p = tmp_path / "doc.xml"
    p.write_text(doc)
    df = (spark.read.format("xml").option("rowTag", "row")
          .load(str(p))
          .select(F.col("_id").cast("int").alias("id"), "name",
                  F.col("geo.lat").cast("double").alias("lat")))
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, "alpha", 1.5), (2, "beta", -2.25)]


def test_to_arrow_interchange(spark):
    df = (load_table(spark, SF_DIR, "region")
          .select("r_regionkey", "r_name").orderBy("r_regionkey"))
    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == df.count()
    assert tbl.column("r_name").to_pylist() == \
        [r.r_name for r in df.collect()]
