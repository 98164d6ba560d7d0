"""A25/A29 closeout: URI sink dispatch, env/SSL option surface,
ensure_topics fail-fast, producer backoff mapping."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from shredder_spark.sinks.config import (
    KafkaConfig, TopicsNotFoundError, _encode_metadata_request,
    _parse_metadata_response, ensure_topics,
)
from shredder_spark.sinks.export import classify_sink_url, export


# -------------------------------------------------------- dispatch (A25)

def test_classify_sink_url_reference_semantics():
    # Exporters.go:171-184 extractHttpPrefix, :140-169 factory
    assert classify_sink_url("http://10.0.0.5:9092") == ("kafka", "10.0.0.5:9092")
    assert classify_sink_url("https://broker:9093") == ("kafka", "broker:9093")
    assert classify_sink_url("/data/out/file_avro") == ("avro", "/data/out/file_avro")
    assert classify_sink_url("s3a://bucket/x") == ("avro", "s3a://bucket/x")


def test_export_file_path_writes_ocf(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "cast(id as string) s")
    out = str(tmp_path / "exported_avro")
    export(df, out)
    from shredder_spark.sinks.avro import read_avro_ocf

    back = read_avro_ocf(spark, out)
    assert back.count() == 10
    assert sorted(r.id for r in back.collect()) == list(range(10))


def test_export_http_requires_topic(spark):
    df = spark.range(3).selectExpr("id")
    with pytest.raises(ValueError, match="topic"):
        export(df, "https://localhost:9092")


def test_export_ssl_never_downgrades_to_wire_tier(spark):
    # connector absent + SSL configured: refuse loudly rather than
    # shipping an SSL-intended export over a plaintext socket
    from shredder_spark.sinks.kafka import KafkaUnavailableError

    df = spark.range(3).selectExpr("id")
    cfg = KafkaConfig(bootstrap_servers="localhost:9092",
                      ssl={"kafka.ssl.truststore.location": "/ca.pem"})
    with pytest.raises(KafkaUnavailableError, match="SSL"):
        export(df, "https://localhost:9092", topic="t1",
               config=cfg, check_topics=False)


def test_export_http_round_trips_through_wire_tier(spark):
    """Round-6 verdict task 7: with the connector absent, the SAME
    public ``export()`` API round-trips end-to-end over the pure-
    Python kafkawire tier — ensure_topics metadata probe, Confluent-
    framed Avro values, partition pinning, real TCP."""
    from tests.kafka_toy_broker import ToyKafkaBroker

    from shredder_spark.sinks.kafka_wire import consume_all
    from shredder_spark.sources.kafka_wire_datasource import (
        register_kafkawire_source)

    df = (spark.range(6).repartition(2)
          .selectExpr("id", "cast(id as string) s"))
    with ToyKafkaBroker() as broker:
        # check_topics=False: the toy broker only knows a topic once
        # it has records (ensure_topics has its own tests above)
        export(df, f"http://{broker.bootstrap}", topic="exp",
               schema_id=9, key_col="id", check_topics=False)
        rows = []
        for part in (0, 1):
            rows.extend(consume_all(broker.bootstrap, "exp", part))
        assert len(rows) == 6
        # Confluent framing: magic 0 + big-endian schema id 9
        for _off, key, value in rows:
            assert value[0] == 0
            assert struct.unpack(">i", value[1:5])[0] == 9
        assert sorted(int(k) for _o, k, _v in rows) == list(range(6))
        # and the read half: format("kafkawire") batch sees the same
        register_kafkawire_source(spark)
        got = (spark.read.format("kafkawire")
               .option("bootstrap", broker.bootstrap)
               .option("topic", "exp").option("partitions", "0,1")
               .load().count())
        assert got == 6


# ---------------------------------------------------- env config (A29)

def test_kafka_config_env_defaults_and_overrides():
    cfg = KafkaConfig.from_env(env={})
    assert cfg.bootstrap_servers == "localhost:9092"
    assert cfg.schema_registry_url == "http://localhost:8081"
    assert cfg.ssl == {}

    env = {
        "KAFKA_BROKER": "b1:9092,b2:9092",
        "KAFKA_SCHEMA_REGISTRY": "https://sr:8081",
        "KAFKA_GROUP_ID": "g7",
    }
    cfg = KafkaConfig.from_env(env=env)
    assert cfg.bootstrap_servers == "b1:9092,b2:9092"
    assert cfg.schema_registry_url == "https://sr:8081"
    assert cfg.consumer_options("topicA")["subscribe"] == "topicA"
    assert cfg.consumer_options()["kafka.group.id"] == "g7"

    # functional-option parity: keyword overrides beat env
    cfg = KafkaConfig.from_env(env=env, bootstrap_servers="other:9092")
    assert cfg.bootstrap_servers == "other:9092"
    with pytest.raises(TypeError):
        KafkaConfig.from_env(env={}, not_an_option=1)


def test_kafka_config_ssl_mapping():
    env = {
        "KAFKA_BROKER": "tls:9093",
        "KAFKA_CA_FILE": "/pki/ca.pem",
        "KAFKA_KEY_FILE": "/pki/client.pem",
        "KAFKA_CERTIFICATE_FILE": "/pki/cert.pem",
    }
    opts = KafkaConfig.from_env(env=env).producer_options()
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/pki/ca.pem"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    # no CA file -> no SSL keys at all
    assert "kafka.security.protocol" not in (
        KafkaConfig.from_env(env={}).producer_options())


def test_backoff_option_mapping():
    # option.go:128 WithBackoff parity -> Java client retry knobs
    opts = KafkaConfig.from_env(
        env={}, max_retries=5, backoff_ms=200, backoff_max_ms=2000,
    ).producer_options()
    assert opts["kafka.retries"] == "5"
    assert opts["kafka.retry.backoff.ms"] == "200"
    assert opts["kafka.retry.backoff.max.ms"] == "2000"


# ------------------------------------------------- ensure_topics (A26)

def _metadata_v0_response(correlation_id: int, topics: dict[str, int]) -> bytes:
    body = struct.pack(">i", correlation_id)
    body += struct.pack(">i", 1)  # one broker
    host = b"localhost"
    body += struct.pack(">ih", 0, len(host)) + host + struct.pack(">i", 9092)
    body += struct.pack(">i", len(topics))
    for name, err in topics.items():
        bn = name.encode()
        body += struct.pack(">hh", err, len(bn)) + bn
        body += struct.pack(">i", 1)  # one partition
        body += struct.pack(">hii", 0, 0, 0)  # err, id, leader
        body += struct.pack(">ii", 1, 0)      # replicas [0]
        body += struct.pack(">ii", 1, 0)      # isr [0]
    return struct.pack(">i", len(body)) + body


class _FakeBroker(threading.Thread):
    """Speaks just enough Kafka Metadata v0 for ensure_topics."""

    def __init__(self, topics: dict[str, int]):
        super().__init__(daemon=True)
        self.topics = topics
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]

    def run(self):
        conn, _ = self.sock.accept()
        with conn:
            size = struct.unpack(">i", conn.recv(4))[0]
            req = b""
            while len(req) < size:
                req += conn.recv(size - len(req))
            api_key, api_ver, corr = struct.unpack_from(">hhi", req, 0)
            assert api_key == 3 and api_ver == 0
            conn.sendall(_metadata_v0_response(corr, self.topics))


def test_ensure_topics_pass_and_fail():
    ok = _FakeBroker({"events": 0, "audit": 0})
    ok.start()
    ensure_topics(["events", "audit"], f"127.0.0.1:{ok.port}")  # no raise

    missing = _FakeBroker({"events": 0, "nope": 3})
    missing.start()
    with pytest.raises(TopicsNotFoundError, match=r"topics not found: \['nope'\]"):
        ensure_topics(["events", "nope"], f"127.0.0.1:{missing.port}")

    absent = _FakeBroker({"events": 0})  # broker omits unknown topic
    absent.start()
    with pytest.raises(TopicsNotFoundError, match="ghost"):
        ensure_topics(["ghost"], f"127.0.0.1:{absent.port}")


def test_metadata_request_golden_bytes():
    raw = _encode_metadata_request(["t1"], correlation_id=7)
    size = struct.unpack(">i", raw[:4])[0]
    assert size == len(raw) - 4
    api_key, api_ver, corr, clen = struct.unpack_from(">hhih", raw, 4)
    assert (api_key, api_ver, corr) == (3, 0, 7)
    body = raw[4 + 10 + clen:]
    n, tlen = struct.unpack_from(">ih", body, 0)
    assert n == 1 and body[6:6 + tlen] == b"t1"


def test_metadata_response_roundtrip():
    payload = _metadata_v0_response(1, {"a": 0, "b": 3})[4:]
    assert _parse_metadata_response(payload) == {"a": 0, "b": 3}
