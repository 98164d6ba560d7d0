"""Vectorized Avro encoder: byte-exact equality vs the per-row codec,
OCF round trips, and the fused fixed-width→Avro ingest job."""

from __future__ import annotations

import io
import json
import random

import numpy as np
import pyarrow as pa
import pytest

from shredder_spark.sinks.avro_codec import (
    RecordCodec, read_ocf_all, write_ocf)
from shredder_spark.sinks.avro_vec import (
    encode_batch, wire_batch, write_ocf_arrow)

SCHEMA = json.dumps({
    "type": "record", "name": "t", "fields": [
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "i", "type": ["null", "int"]},
        {"name": "l", "type": "long"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "d", "type": "double"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "y", "type": ["null", "bytes"]},
        {"name": "ts", "type": ["null", {"type": "long",
                                         "logicalType": "timestamp-micros"}]},
    ],
})

ARROW_SCHEMA = pa.schema([
    pa.field("b", pa.bool_()),
    pa.field("i", pa.int32()),
    pa.field("l", pa.int64(), nullable=False),
    pa.field("f", pa.float32()),
    pa.field("d", pa.float64(), nullable=False),
    pa.field("s", pa.string()),
    pa.field("y", pa.binary()),
    pa.field("ts", pa.int64()),
])


def _random_rows(n: int, seed: int, with_nulls: bool = True):
    rng = random.Random(seed)

    def maybe(v):
        return None if with_nulls and rng.random() < 0.25 else v

    rows = []
    for _ in range(n):
        rows.append((
            maybe(rng.random() < 0.5),
            maybe(rng.randint(-2**31, 2**31 - 1)),
            rng.choice([0, 1, -1, 63, 64, -64, -65,
                        rng.randint(-2**63, 2**63 - 1)]),
            maybe(float(np.float32(rng.uniform(-1e6, 1e6)))),
            rng.uniform(-1e18, 1e18),
            maybe(rng.choice(["", "a", "héllo wörld", "x" * rng.randint(0, 200)])),
            maybe(rng.choice([b"", b"\x00\xff", bytes(range(rng.randint(0, 64)))])),
            maybe(rng.randint(-2**62, 2**62)),
        ))
    return rows


def _batch(rows) -> pa.RecordBatch:
    cols = list(zip(*rows)) if rows else [[] for _ in range(8)]
    arrays = [pa.array(list(c), type=f.type)
              for c, f in zip(cols, ARROW_SCHEMA)]
    return pa.RecordBatch.from_arrays(arrays, schema=ARROW_SCHEMA)


@pytest.mark.parametrize("seed,n,with_nulls", [
    (1, 1, True), (2, 97, True), (3, 1000, True), (4, 257, False)])
def test_encode_batch_byte_exact(seed, n, with_nulls):
    rc = RecordCodec(SCHEMA)
    rows = _random_rows(n, seed, with_nulls)
    want = b"".join(rc.encode(r) for r in rows)
    got = encode_batch(rc, _batch(rows))
    assert got == want


def test_encode_batch_varint_boundaries():
    # every 7-bit varint width boundary, both signs, zigzag edges
    vals = [0, -1, 1, 63, -64, 64, -65]
    for k in range(1, 10):
        vals += [v for v in (2**(7 * k) - 1, 2**(7 * k), -(2**(7 * k)),
                             2**(7 * k - 1))
                 if -2**63 <= v < 2**63]
    vals += [2**63 - 1, -2**63]
    rc = RecordCodec(json.dumps({
        "type": "record", "name": "v",
        "fields": [{"name": "l", "type": "long"}]}))
    want = b"".join(rc.encode((v,)) for v in vals)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(vals, type=pa.int64())], names=["l"])
    assert encode_batch(rc, batch) == want


def test_encode_batch_sliced_batch():
    # pa slices carry buffer offsets — the encoder must respect them
    rc = RecordCodec(SCHEMA)
    rows = _random_rows(500, 7)
    batch = _batch(rows)
    sl = batch.slice(123, 200)
    want = b"".join(rc.encode(r) for r in rows[123:323])
    assert encode_batch(rc, sl) == want


def test_encode_batch_null_in_non_nullable_raises():
    rc = RecordCodec(json.dumps({
        "type": "record", "name": "v",
        "fields": [{"name": "l", "type": "long"}]}))
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, None], type=pa.int64())], names=["l"])
    with pytest.raises(ValueError, match="non-nullable"):
        encode_batch(rc, batch)


def test_encode_batch_null_first_union_order():
    # [T, "null"] (Spark's writer order) — value branch byte flips
    rc = RecordCodec(json.dumps({
        "type": "record", "name": "v",
        "fields": [{"name": "l", "type": ["long", "null"]}]}))
    rows = [(5,), (None,), (-3,)]
    want = b"".join(rc.encode(r) for r in rows)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([5, None, -3], type=pa.int64())], names=["l"])
    assert encode_batch(rc, batch) == want


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_write_ocf_arrow_round_trip(codec):
    rc = RecordCodec(SCHEMA)
    rows = _random_rows(777, 11)
    buf = io.BytesIO()
    n = write_ocf_arrow(buf, rc, [_batch(rows)], codec=codec,
                        block_rows=256)
    assert n == 777
    buf.seek(0)
    schema, got = read_ocf_all(buf)
    assert [tuple(r) for r in got] == rows


def test_write_ocf_arrow_matches_row_writer_stream():
    # same rows through both writers parse to the same records
    rc = RecordCodec(SCHEMA)
    rows = _random_rows(300, 13)
    b1, b2 = io.BytesIO(), io.BytesIO()
    write_ocf(b1, rc, rows, codec="snappy")
    write_ocf_arrow(b2, rc, [_batch(rows)], codec="snappy")
    b1.seek(0)
    b2.seek(0)
    assert read_ocf_all(b1)[1] == read_ocf_all(b2)[1]


def test_wire_batch_temporals():
    ts = pa.array([0, 86_400_000_000, None], type=pa.timestamp("us"))
    d = pa.array([0, 1, None], type=pa.date32())
    b = pa.RecordBatch.from_arrays([ts, d], names=["ts", "d"])
    w = wire_batch(b)
    assert w.column(0).type == pa.int64()
    assert w.column(1).type == pa.int32()
    assert w.column(0).to_pylist() == [0, 86_400_000_000, None]
    assert w.column(1).to_pylist() == [0, 1, None]


def test_fused_fixed_width_to_avro(spark, tmp_path):
    """End-to-end: fixed-width feed → fused job → OCF files that decode
    to exactly what the expression-tier read + row sink would produce."""
    from shredder_spark.sinks.avro import read_avro_ocf, write_avro_ocf
    from shredder_spark.sinks.avro_vec import fixed_width_to_avro_fused
    from shredder_spark.sources.fixedwidth import read_fixed_width

    schema = {
        "type": "record", "name": "r", "encoding": "ascii",
        "fields": [
            {"name": "k", "type": "long", "len": 6},
            {"name": "v", "type": "double", "len": 10},
            {"name": "s", "type": "string", "len": 8},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros",
                                    "len": 26}},
        ],
    }
    lines = []
    for i in range(500):
        lines.append(
            f"{i:6d}{i * 1.5:10.2f}{'s%03d' % i:<8s}"
            f"2024-03-0{1 + i % 9}-12.30.0{i % 6}.{i % 1000:03d}   ")
    feed = tmp_path / "feed.txt"
    feed.write_bytes(("\r\n".join(lines) + "\r\n").encode())

    out_fused = str(tmp_path / "fused")
    n = fixed_width_to_avro_fused(spark, str(feed), schema, out_fused,
                                  tasks=4)
    assert n == 500

    out_row = str(tmp_path / "rowpath")
    df = read_fixed_width(spark, str(feed), schema)
    write_avro_ocf(df, out_row, codec="snappy")

    got = read_avro_ocf(spark, out_fused)
    want = read_avro_ocf(spark, out_row)
    assert got.schema == want.schema
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_encode_batch_rows_per_record():
    rc = RecordCodec(SCHEMA)
    rows = _random_rows(400, 17)
    from shredder_spark.sinks.avro_vec import encode_batch_rows
    got = encode_batch_rows(rc, _batch(rows))
    assert got == [rc.encode(r) for r in rows]
    assert encode_batch_rows(rc, _batch([])) == []
