"""Kafka wire-protocol tier: produce→consume round trip over real
sockets against an in-process broker speaking the public protocol
(tests/kafka_toy_broker.py — a second, independent implementation of
the published encodings, so this is spec conformance, not echoing).

Closes the round-4 "Kafka paths byte-verified offline only" gap to
the extent possible without a real cluster: record-batch v2 bytes,
CRC32C, Produce v3 / Fetch v4 framing, broker offset assignment,
partition pinning, the Metadata v0 probe, and the full
prepare_kafka_batch → wire → de-frame → Avro-decode loop."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from shredder_spark.sinks import kafka_wire as kw
from shredder_spark.sinks.config import TopicsNotFoundError, ensure_topics
from tests.kafka_toy_broker import ToyKafkaBroker


def test_crc32c_known_answers():
    # RFC 3720 B.4 check value
    assert kw.crc32c(b"123456789") == 0xE3069283
    assert kw.crc32c(b"") == 0
    assert kw.crc32c(bytes(32)) == 0x8A9136AA


def test_varint_round_trip():
    for n in (0, 1, -1, 63, -64, 64, 300, -301, 2**31 - 1, -2**31,
              2**62, -2**62):
        buf = kw.write_varint(n)
        got, pos = kw.read_varint(buf, 0)
        assert got == n and pos == len(buf)


def test_record_batch_round_trip():
    records = [(b"k0", b"v0"), (None, b"null-key"), (b"", b""),
               (b"k3", bytes(range(256)))]
    batch = kw.encode_record_batch(records)
    got = list(kw.decode_record_batches(batch))
    assert [(o, k, v) for o, (k, v) in zip(range(4), records)] == got


def test_record_batch_crc_detects_corruption():
    batch = bytearray(kw.encode_record_batch([(b"k", b"v")]))
    batch[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(kw.decode_record_batches(bytes(batch)))


def test_produce_fetch_round_trip_and_offsets():
    with ToyKafkaBroker() as broker:
        p = kw.KafkaWireProducer(broker.bootstrap)
        for i in range(5):
            p.send("t1", 0, f"k{i}".encode(), f"v{i}".encode())
        p.send("t1", 1, None, b"other-partition")
        bases = p.flush()
        assert bases[("t1", 0)] == 0 and bases[("t1", 1)] == 0
        # second flush: broker assigns continuing offsets
        p.send("t1", 0, b"k5", b"v5")
        assert p.flush()[("t1", 0)] == 5

        got = kw.consume_all(broker.bootstrap, "t1", 0)
        assert [(o, k.decode(), v.decode()) for o, k, v in got] == [
            (i, f"k{i}", f"v{i}") for i in range(6)]
        assert kw.consume_all(broker.bootstrap, "t1", 1) == [
            (0, None, b"other-partition")]
        # offset seek: start mid-log
        assert [o for o, _, _ in
                kw.consume_all(broker.bootstrap, "t1", 0,
                               from_offset=4)] == [4, 5]


def test_metadata_probe_against_broker():
    with ToyKafkaBroker() as broker:
        p = kw.KafkaWireProducer(broker.bootstrap)
        p.send("known", 0, None, b"x")
        p.flush()
        ensure_topics(["known"], broker.bootstrap)  # no raise
        with pytest.raises(TopicsNotFoundError):
            ensure_topics(["known", "missing"], broker.bootstrap)


def test_distributed_read_matches_driver_consume(spark):
    """read_kafka_wire (one Spark task per partition) returns exactly
    what driver-side consume_all sees, de-framed identically."""
    with ToyKafkaBroker() as broker:
        p = kw.KafkaWireProducer(broker.bootstrap)
        for part in range(3):
            for i in range(7):
                p.send("rt", part, f"{part}:{i}".encode(),
                       f"payload-{part}-{i}".encode())
        p.flush()
        df = kw.read_kafka_wire(spark, "rt", broker.bootstrap, [0, 1, 2])
        got = {(r.partition, r.offset, bytes(r.key), bytes(r.value))
               for r in df.collect()}
        want = {(part, off, key, value)
                for part in range(3)
                for off, key, value in kw.consume_all(
                    broker.bootstrap, "rt", part)}
        assert got == want and len(got) == 21


def test_end_to_end_framed_avro_through_broker(spark):
    """The reference pipeline A22/A23/A26/A27 shape over real sockets:
    typed rows → Avro + Confluent framing + partition pinning
    (prepare_kafka_batch) → wire produce from executors → fetch →
    de-frame → Avro-decode → original values, partitions preserved."""
    from shredder_spark.sinks.avro import spark_schema_to_avro
    from shredder_spark.sinks.avro_codec import RecordCodec
    from shredder_spark.sinks.kafka import prepare_kafka_batch

    src = (spark.range(40)
           .select(F.col("id").alias("k"),
                   (F.col("id") * 7 % 13).alias("v"),
                   F.concat(F.lit("row-"), F.col("id")).alias("s"))
           .repartition(3))
    batch = prepare_kafka_batch(src, schema_id=7, key_col="k")
    avro_schema = spark_schema_to_avro(src.select("k", "v", "s").schema)

    with ToyKafkaBroker() as broker:
        kw.write_kafka_wire(batch, "docs", broker.bootstrap)
        rows = {}
        for part in range(3):
            for off, key, value in kw.consume_all(
                    broker.bootstrap, "docs", part):
                # Confluent frame: magic 0 + big-endian schema id 7
                assert value[0] == 0
                assert int.from_bytes(value[1:5], "big") == 7
                rec = RecordCodec(avro_schema).decode(value[5:])
                rows[int(key.decode())] = (rec, part)
    assert len(rows) == 40
    want = {r.k: (r.v, r.s) for r in src.collect()}
    for k, ((kk, vv, ss), _part) in rows.items():
        assert kk == k and (vv, ss) == want[k]
    # partition pinning: each spark partition landed wholly in one
    # kafka partition
    by_part = {}
    for k, (_rec, part) in rows.items():
        by_part.setdefault(part, set()).add(k)
    assert len(by_part) == 3
