"""Fixed-width source tests over FIXTURES.md F1–F4."""

from __future__ import annotations

import datetime

import pytest

from shredder_spark.avro_schema import parse_avro_fixed_schema
from shredder_spark.sources.fixedwidth import read_fixed_width
from tests import fixtures


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fw")
    fixtures.write_f1(str(d / "f1.txt"))
    fixtures.write_f2(str(d / "f2.txt"))
    fixtures.write_f3(str(d / "f3.txt"))
    fixtures.write_f4(str(d / "f4.txt"))
    return d


def test_schema_compile():
    fs = parse_avro_fixed_schema(fixtures.F1_WEBLOG_SCHEMA)
    assert [f.name for f in fs.fields] == [
        "Idnr", "Event_time", "Idnr2", "Ok", "Some_text1", "Some_text2"]
    assert fs.row_width == 101
    st = fs.to_struct_type()
    assert st["Event_time"].dataType.typeName() == "timestamp"
    assert st["Idnr"].metadata["len"] == 8


def test_f1_weblog(spark, fixture_dir):
    df = read_fixed_width(spark, str(fixture_dir / "f1.txt"), fixtures.F1_WEBLOG_SCHEMA)
    rows = df.orderBy("Idnr").collect()
    assert len(rows) == 1000
    r0 = rows[0]
    assert r0.Idnr == 0
    assert r0.Ok is True  # 'J'
    assert rows[1].Ok is False  # 'N'
    assert rows[2].Ok is True  # 'y'
    assert r0.Some_text1.rstrip() == "text1-0"  # strings keep padding
    assert len(r0.Some_text1) == 30
    assert r0.Event_time.year == 2020 and r0.Event_time.month == 7


def test_f2_alltypes_golden(spark, fixture_dir):
    df = read_fixed_width(spark, str(fixture_dir / "f2.txt"), fixtures.F2_ALLTYPES_SCHEMA)
    rows = df.collect()
    assert len(rows) == 500  # footer line excluded
    import random
    rng = random.Random(42)
    r = rows[0]
    assert r.B is True
    assert bytes(r.Raw) == b"b000"
    f = rng.uniform(-1000, 1000)
    assert abs(r.F - f) < 1e-2
    d = rng.uniform(-1e6, 1e6)
    assert abs(r.D - d) < 1e-4
    assert r.I == rng.randrange(-99999, 99999)
    assert r.L == rng.randrange(-10**11, 10**11)
    assert r.S == "s0  padded".ljust(16)
    dt_frac = rng.randrange(10**6)
    assert r.Dt == datetime.date(2020, 7, 9)
    ms_frac = rng.randrange(1000)
    # intended semantics: real epoch millis (reference bug returned seconds)
    assert r.Tsm.microsecond == ms_frac * 1000
    us_frac = rng.randrange(10**6)
    assert r.Tsu.microsecond == us_frac
    # null boolean for 'N'? index 4 is 'N' → False; index 2 'Y' → True
    assert rows[4].B is False


def test_f3_utf8_rune_boundaries(spark, fixture_dir):
    df = read_fixed_width(spark, str(fixture_dir / "f3.txt"), fixtures.F3_UTF8_SCHEMA)
    rows = df.orderBy("Id").collect()
    assert len(rows) == 200
    assert rows[0].Name.rstrip() == "åäö-nm"
    assert rows[0].City.rstrip() == "東京"
    assert rows[0].Note.rstrip() == "n0-ééé"
    assert rows[1].Name.rstrip() == "日本語"
    # every field is exactly its rune width
    assert all(len(r.Name) == 8 and len(r.City) == 8 for r in rows)


def test_f4_quarantine(spark, fixture_dir):
    res = read_fixed_width(
        spark, str(fixture_dir / "f4.txt"), fixtures.F1_WEBLOG_SCHEMA,
        with_quarantine=True)
    clean = res.clean.collect()
    bad = res.quarantine.collect()
    # Strict CRLF framing: the stray LF-only terminator at row 3 merges
    # rows 3+4 into one (quarantined) record, and row 99's LF leaves a
    # trailing \n → 99 records total, 10 quarantined (row 4 is collateral
    # of row 3's framing error).
    assert len(clean) + len(bad) == 99
    assert len(bad) == 10
    reasons = {e for r in bad for e in r._errors}
    assert any(e.startswith("row_width:") for e in reasons)
    assert "bad_Idnr" in reasons
    assert "bad_Event_time" in reasons
    # clean side fully typed, no nulls in fallible columns
    assert all(r.Idnr is not None and r.Event_time is not None for r in clean)


def test_observed_ingest_report(spark, tmp_path):
    """A30 parity: in-job metrics via observe() — no second scan —
    match the actual row/char totals, and the report renders."""
    import pyspark.sql.functions as F

    from shredder_spark.metrics import ObservedIngest
    from tests.fixtures import F1_WEBLOG_SCHEMA, write_f1

    p = tmp_path / "f1.txt"
    write_f1(str(p), rows=500)
    df = read_fixed_width(spark, str(p), F1_WEBLOG_SCHEMA)
    obs = ObservedIngest(df, size_col="Some_text1")
    report = obs.time(lambda d: d.write.format("noop").mode("overwrite").save())
    assert report.rows == 500
    exact = df.agg(F.sum(F.length("Some_text1"))).first()[0]
    assert report.chars == exact
    assert report.wall_s > 0 and "MB/s" in report.render()


def test_ascii_mode_matches_default_on_ascii_input(spark, fixture_dir):
    """encoding='ascii' byte slicing must agree with the default rune
    path field-for-field on a pure-ASCII feed (F1)."""
    a = read_fixed_width(spark, str(fixture_dir / "f1.txt"),
                         fixtures.F1_WEBLOG_SCHEMA, encoding="ascii")
    d = read_fixed_width(spark, str(fixture_dir / "f1.txt"),
                         fixtures.F1_WEBLOG_SCHEMA)
    assert a.schema == d.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, d.collect()))


def test_ascii_mode_on_multibyte_shifts_only_downstream(spark, fixture_dir):
    """encoding='ascii' on the UTF-8 fixture: byte offsets agree with
    rune offsets UP TO the first multibyte rune, so F3's leading int Id
    still parses on every row; fields AFTER a multibyte rune slice at
    shifted offsets (documented contract — declare ascii only for
    single-byte feeds; typed fields would null out via fallible casts)."""
    df = read_fixed_width(spark, str(fixture_dir / "f3.txt"),
                          fixtures.F3_UTF8_SCHEMA, encoding="ascii")
    rows = df.orderBy("Id").collect()
    assert len(rows) == 200
    assert [r.Id for r in rows] == list(range(200))
    # a shifted downstream slice: row 0's Name starts with multibyte
    # åäö — its byte-sliced Note differs from the rune-correct one
    rune_rows = read_fixed_width(
        spark, str(fixture_dir / "f3.txt"),
        fixtures.F3_UTF8_SCHEMA).orderBy("Id").collect()
    assert rows[0].Note != rune_rows[0].Note


def test_schema_declared_ascii_encoding(spark, tmp_path):
    """A schema carrying "encoding": "ascii" selects byte slicing with
    no per-call opt-in — same values, leaner plan (no rune guard)."""
    import json

    from shredder_spark.sources.fixedwidth import read_fixed_width

    mk = lambda enc: {"type": "record", "name": "t",
                      **({"encoding": enc} if enc else {}),
                      "fields": [
                          {"name": "a", "type": "string", "len": 3},
                          {"name": "b", "type": "int", "len": 4}]}
    p = tmp_path / "f.txt"
    p.write_bytes(b"abc  12\r\nxyz 345\r\n")
    declared = read_fixed_width(spark, str(p), json.dumps(mk("ascii")))
    default = read_fixed_width(spark, str(p), json.dumps(mk(None)))
    explicit = read_fixed_width(spark, str(p), json.dumps(mk(None)),
                                encoding="ascii")
    rows = {(r.a, r.b) for r in declared.collect()}
    assert rows == {("abc", 12), ("xyz", 345)}
    assert rows == {(r.a, r.b) for r in default.collect()}
    # declared-ascii plan matches the explicit-ascii plan (byte path)
    import re

    norm = lambda df: re.sub(
        r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString())
    assert norm(declared) == norm(explicit)
    # an explicit utf8 override beats the schema declaration
    utf8 = read_fixed_width(spark, str(p), json.dumps(mk("ascii")),
                            encoding="utf8")
    assert rows == {(r.a, r.b) for r in utf8.collect()}
