"""Kafka connection config surface (reference A29) + topic fail-fast.

The reference builds its client config from environment variables with
functional options layered on top (`kafkaavro/producer.go:59-82`,
`consumer.go:59-88`, `option.go:11-132`):

- ``KAFKA_BROKER`` (bootstrap servers; its producer default is a lab
  address, consumer default ``localhost:9092`` — we default BOTH to
  localhost), ``KAFKA_GROUP_ID`` (consumer),
  ``KAFKA_SCHEMA_REGISTRY`` (default ``http://localhost:8081``);
- SSL switches on when ``KAFKA_CA_FILE`` is set: ``KAFKA_CA_FILE`` /
  ``KAFKA_KEY_FILE`` / ``KAFKA_CERTIFICATE_FILE`` (librdkafka's
  ``ssl.ca.location`` / ``ssl.key.location`` /
  ``ssl.certificate.location``).

Spark's Kafka connector passes ``kafka.*`` options to the JAVA client,
whose PEM support spells differently: the CA pem becomes a PEM-typed
truststore, and the key+certificate pair a PEM-typed keystore (the
Java client wants key and cert concatenated in one file — documented
on :func:`producer_options`). The reference's functional options map
to plain keyword arguments / the ``overrides`` dict (Python needs no
closure plumbing for this).

Backoff parity (`option.go:128` WithBackoff): the reference injects a
backoff policy object into its delivery-retry loop; the Java producer
retries internally, configured by ``retries`` / ``retry.backoff.ms`` /
``retry.backoff.max.ms`` — exposed here as the ``max_retries`` /
``backoff_ms`` / ``backoff_max_ms`` keywords.

``ensure_topics`` (reference `consumer.go:191-212` EnsureTopics) is a
fail-fast existence check before starting a stream. It speaks the
Kafka wire protocol directly (Metadata v0 over a socket) so it needs
neither the connector jar nor a Python Kafka client — the same
metadata the reference fetches via librdkafka's GetMetadata.
"""

from __future__ import annotations

import os
import socket
import struct
from dataclasses import dataclass, field


_DEF_BROKER = "localhost:9092"
_DEF_REGISTRY = "http://localhost:8081"


class TopicsNotFoundError(RuntimeError):
    pass


def _ssl_options(env: dict) -> dict:
    ca = env.get("KAFKA_CA_FILE", "")
    if not ca:
        return {}
    opts = {
        "kafka.security.protocol": "SSL",
        "kafka.ssl.truststore.type": "PEM",
        "kafka.ssl.truststore.location": ca,
    }
    key = env.get("KAFKA_KEY_FILE", "")
    cert = env.get("KAFKA_CERTIFICATE_FILE", "")
    if key or cert:
        # Java's PEM keystore is ONE file holding the private key and
        # the certificate chain. librdkafka (the reference) takes them
        # separately; concatenate cert+key into one pem for Java and
        # point both envs at it, or pre-merge and set KAFKA_KEY_FILE.
        opts["kafka.ssl.keystore.type"] = "PEM"
        opts["kafka.ssl.keystore.location"] = key or cert
    return opts


@dataclass
class KafkaConfig:
    """Resolved connection settings. ``from_env`` mirrors the
    reference's env-default resolution; every field can be overridden
    by keyword (the functional-option parity surface)."""

    bootstrap_servers: str = _DEF_BROKER
    schema_registry_url: str = _DEF_REGISTRY
    group_id: str | None = None
    ssl: dict = field(default_factory=dict)
    # producer retry/backoff (reference WithBackoff parity)
    max_retries: int | None = None
    backoff_ms: int | None = None
    backoff_max_ms: int | None = None

    @classmethod
    def from_env(cls, env: dict | None = None, **overrides) -> "KafkaConfig":
        env = dict(os.environ) if env is None else env
        cfg = cls(
            bootstrap_servers=env.get("KAFKA_BROKER", _DEF_BROKER),
            schema_registry_url=env.get("KAFKA_SCHEMA_REGISTRY", _DEF_REGISTRY),
            group_id=env.get("KAFKA_GROUP_ID") or None,
            ssl=_ssl_options(env),
        )
        for k, v in overrides.items():
            if not hasattr(cfg, k):
                raise TypeError(f"unknown KafkaConfig override {k!r}")
            setattr(cfg, k, v)
        return cfg

    # ---- Spark option dicts -------------------------------------
    def producer_options(self) -> dict:
        """``df.write.format("kafka").options(**cfg.producer_options())``"""
        opts = {"kafka.bootstrap.servers": self.bootstrap_servers, **self.ssl}
        if self.max_retries is not None:
            opts["kafka.retries"] = str(self.max_retries)
        if self.backoff_ms is not None:
            opts["kafka.retry.backoff.ms"] = str(self.backoff_ms)
        if self.backoff_max_ms is not None:
            opts["kafka.retry.backoff.max.ms"] = str(self.backoff_max_ms)
        return opts

    def consumer_options(self, subscribe: str | None = None) -> dict:
        """``spark.readStream.format("kafka").options(**cfg.consumer_options(t))``

        The reference's ``auto.offset.reset=earliest`` maps to Spark's
        own ``startingOffsets`` (the connector forbids setting the
        consumer property directly); group id maps to
        ``kafka.group.id`` (optional — Spark manages offsets in its
        checkpoint, not the broker's committed offsets).
        """
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": "earliest",
            **self.ssl,
        }
        if self.group_id:
            opts["kafka.group.id"] = self.group_id
        if subscribe is not None:
            opts["subscribe"] = subscribe
        return opts


# ------------------------------------------------------- ensure_topics

def _encode_metadata_request(topics: list[str], correlation_id: int) -> bytes:
    """Kafka MetadataRequest v0 (api_key=3): header + topic array."""
    client = b"shredder_spark"
    body = struct.pack(">hhih", 3, 0, correlation_id, len(client)) + client
    body += struct.pack(">i", len(topics))
    for t in topics:
        bt = t.encode()
        body += struct.pack(">h", len(bt)) + bt
    return struct.pack(">i", len(body)) + body


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("kafka connection closed mid-response")
        buf += chunk
    return buf


def _parse_metadata_response(payload: bytes) -> dict[str, int]:
    """MetadataResponse v0 → {topic: error_code}. Skips the broker
    array; per-topic error 3 = UNKNOWN_TOPIC_OR_PARTITION."""
    off = 4  # correlation id
    (n_brokers,) = struct.unpack_from(">i", payload, off)
    off += 4
    for _ in range(n_brokers):
        off += 4  # node id
        (hlen,) = struct.unpack_from(">h", payload, off)
        off += 2 + hlen + 4  # host + port
    (n_topics,) = struct.unpack_from(">i", payload, off)
    off += 4
    out: dict[str, int] = {}
    for _ in range(n_topics):
        (err,) = struct.unpack_from(">h", payload, off)
        off += 2
        (tlen,) = struct.unpack_from(">h", payload, off)
        off += 2
        name = payload[off:off + tlen].decode()
        off += tlen
        (n_parts,) = struct.unpack_from(">i", payload, off)
        off += 4
        for _ in range(n_parts):
            # partition: err int16, id int32, leader int32,
            # replicas int32[], isr int32[]
            off += 2 + 4 + 4
            (n_rep,) = struct.unpack_from(">i", payload, off)
            off += 4 + 4 * n_rep
            (n_isr,) = struct.unpack_from(">i", payload, off)
            off += 4 + 4 * n_isr
        out[name] = err
    return out


def ensure_topics(
    topics: list[str],
    bootstrap_servers: str | None = None,
    *,
    timeout: float = 6.0,
) -> None:
    """Raise :class:`TopicsNotFoundError` unless every topic exists on
    the broker — the reference's fail-fast before consuming
    (`consumer.go:191-212`; its 6000 ms metadata timeout is the
    default here). Plaintext listeners only (the metadata probe speaks
    the wire protocol directly; for SSL brokers rely on the stream
    failing fast instead)."""
    servers = bootstrap_servers or KafkaConfig.from_env().bootstrap_servers
    host, _, port = servers.split(",")[0].partition(":")
    with socket.create_connection((host, int(port or 9092)),
                                  timeout=timeout) as sock:
        sock.sendall(_encode_metadata_request(list(topics), correlation_id=1))
        (size,) = struct.unpack(">i", _read_exact(sock, 4))
        meta = _parse_metadata_response(_read_exact(sock, size))
    not_found = [t for t in topics if meta.get(t, 3) != 0]
    if not_found:
        raise TopicsNotFoundError(f"topics not found: {not_found}")
