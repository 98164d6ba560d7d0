"""In-process toy Kafka broker for wire-protocol round-trip tests.

Implements just enough of the PUBLIC Apache Kafka protocol
(kafka.apache.org/protocol) to exercise the client tier in
``shredder_spark/sinks/kafka_wire.py`` and the Metadata v0 probe in
``sinks/config.py`` against real sockets:

- **Metadata v0** — advertises itself as the sole broker/leader.
- **Produce v3** — validates each record batch's CRC32C, assigns base
  offsets, stores the batch bytes verbatim (real brokers store v2
  batches verbatim too — that is the zero-copy design the format
  exists for).
- **Fetch v4** — serves stored batches from the requested offset.

Test infrastructure only: single-threaded per connection, in-memory
log, no replication/consumer groups. The point is that the CLIENT
bytes on the socket follow the published spec — verified here by a
second implementation of the same spec, not by echoing.
"""

from __future__ import annotations

import socket
import struct
import threading

from shredder_spark.sinks.kafka_wire import crc32c


def _read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError
        buf += chunk
    return buf


def _str(s):
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _read_str(buf, pos):
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n < 0:
        return None, pos
    return buf[pos:pos + n].decode(), pos + n


class ToyKafkaBroker:
    """`with ToyKafkaBroker() as b: ... b.bootstrap ...`"""

    def __init__(self, host: str = "127.0.0.1") -> None:
        self._srv = socket.create_server((host, 0))
        self.host, self.port = self._srv.getsockname()
        self.bootstrap = f"{self.host}:{self.port}"
        # {(topic, partition): [(base_offset, n_records, batch_bytes)]}
        self._log: dict[tuple[str, int], list] = {}
        self._bases: dict[tuple[str, int], list] = {}  # sorted base offsets
        self._hwm: dict[tuple[str, int], int] = {}
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)

    # -- lifecycle ------------------------------------------------------
    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._handle_conn, args=(conn,),
                             daemon=True).start()

    def _handle_conn(self, conn):
        try:
            with conn:
                while True:
                    (size,) = struct.unpack(">i", _read_exact(conn, 4))
                    req = _read_exact(conn, size)
                    resp = self._dispatch(req)
                    conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError):
            return

    # -- protocol -------------------------------------------------------
    def _dispatch(self, req: bytes) -> bytes:
        api_key, api_version, corr = struct.unpack_from(">hhi", req, 0)
        _, pos = _read_str(req, 8)          # client_id
        if api_key == 3:                    # Metadata (v0)
            return self._metadata_v0(req, pos, corr)
        if api_key == 0 and api_version == 3:
            return self._produce_v3(req, pos, corr)
        if api_key == 1 and api_version == 4:
            return self._fetch_v4(req, pos, corr)
        if api_key == 2 and api_version == 1:
            return self._list_offsets_v1(req, pos, corr)
        raise ValueError(f"toy broker: unsupported api {api_key} "
                         f"v{api_version}")

    def _list_offsets_v1(self, req, pos, corr) -> bytes:
        """ListOffsets v1: timestamp -1 → high watermark, -2 → log
        start (the streaming source's hwm probe — a fetch would ship
        record bytes just to read one i64)."""
        pos += 4                                          # replica_id
        (n_topics,) = struct.unpack_from(">i", req, pos)
        pos += 4
        assert n_topics == 1
        topic, pos = _read_str(req, pos)
        (n_parts,) = struct.unpack_from(">i", req, pos)
        pos += 4
        entries = []
        for _ in range(n_parts):                 # batched, like the real
            part, ts = struct.unpack_from(">iq", req, pos)  # protocol
            pos += 12
            with self._lock:
                hwm = self._hwm.get((topic, part), 0)
            entries.append((part, 0 if ts == -2 else hwm))
        out = bytearray(struct.pack(">i", corr))
        out += struct.pack(">i", 1)
        out += _str(topic)
        out += struct.pack(">i", len(entries))
        for part, off in entries:
            out += struct.pack(">ihqq", part, 0, -1, off)  # err, ts, offset
        return bytes(out)

    def _metadata_v0(self, req, pos, corr) -> bytes:
        (n,) = struct.unpack_from(">i", req, pos)
        pos += 4
        topics = []
        for _ in range(n):
            t, pos = _read_str(req, pos)
            topics.append(t)
        if not topics:
            with self._lock:
                topics = sorted({t for t, _ in self._log})
        out = bytearray(struct.pack(">i", corr))
        out += struct.pack(">i", 1)                       # one broker
        out += struct.pack(">i", 0) + _str(self.host)     # node 0
        out += struct.pack(">i", self.port)
        out += struct.pack(">i", len(topics))
        for t in topics:
            with self._lock:
                parts = sorted({p for (tt, p) in self._log if tt == t})
            # real-broker semantics (auto-create off): unknown topic →
            # error 3 UNKNOWN_TOPIC_OR_PARTITION
            err = 0 if parts else 3
            out += struct.pack(">h", err) + _str(t)
            out += struct.pack(">i", len(parts))
            for p in parts:
                out += struct.pack(">hii", 0, p, 0)       # err, id, leader
                out += struct.pack(">i", 1) + struct.pack(">i", 0)
                out += struct.pack(">i", 1) + struct.pack(">i", 0)
        return bytes(out)

    def _produce_v3(self, req, pos, corr) -> bytes:
        _txn, pos = _read_str(req, pos)
        _acks, _timeout = struct.unpack_from(">hi", req, pos)
        pos += 6
        (n_topics,) = struct.unpack_from(">i", req, pos)
        pos += 4
        results = []
        for _ in range(n_topics):
            topic, pos = _read_str(req, pos)
            (n_parts,) = struct.unpack_from(">i", req, pos)
            pos += 4
            part_results = []
            for _ in range(n_parts):
                (part,) = struct.unpack_from(">i", req, pos)
                pos += 4
                (blen,) = struct.unpack_from(">i", req, pos)
                pos += 4
                batch = req[pos:pos + max(blen, 0)]
                pos += max(blen, 0)
                err, base = self._append(topic, part, batch)
                part_results.append((part, err, base))
            results.append((topic, part_results))
        out = bytearray(struct.pack(">i", corr))
        out += struct.pack(">i", len(results))
        for topic, part_results in results:
            out += _str(topic)
            out += struct.pack(">i", len(part_results))
            for part, err, base in part_results:
                out += struct.pack(">ihqq", part, err, base, -1)
        out += struct.pack(">i", 0)                       # throttle_ms
        return bytes(out)

    def _append(self, topic, part, batch) -> tuple[int, int]:
        if len(batch) < 61 or batch[16] != 2:
            return 87, -1                                 # INVALID_RECORD
        (crc,) = struct.unpack_from(">I", batch, 17)
        if crc32c(batch[21:]) != crc:
            return 46, -1                                 # CORRUPT_MESSAGE
        (count,) = struct.unpack_from(">i", batch, 57)
        with self._lock:
            key = (topic, part)
            base = self._hwm.get(key, 0)
            # assign the broker offset: patch baseOffset (outside the
            # CRC'd region — the v2 design allows exactly this)
            patched = struct.pack(">q", base) + batch[8:]
            self._log.setdefault(key, []).append((base, count, patched))
            self._bases.setdefault(key, []).append(base)
            self._hwm[key] = base + count
        return 0, base

    def _fetch_v4(self, req, pos, corr) -> bytes:
        pos += 4 + 4 + 4 + 4 + 1          # replica, wait, min, max, iso
        (n_topics,) = struct.unpack_from(">i", req, pos)
        pos += 4
        assert n_topics == 1
        topic, pos = _read_str(req, pos)
        (n_parts,) = struct.unpack_from(">i", req, pos)
        pos += 4
        assert n_parts == 1
        part, offset, maxb = struct.unpack_from(">iqi", req, pos)
        # Honor the partition max_bytes like a real broker (r12: the
        # old ship-the-whole-tail behavior made every bounded
        # microbatch over a deep backlog transfer the entire log —
        # the soak leg measured the fixture, not the engine), always
        # returning at least one batch past `offset`; bisect on base
        # offsets replaces the O(log-length) scan per fetch.
        import bisect

        with self._lock:
            key = (topic, part)
            hwm = self._hwm.get(key, 0)
            log = self._log.get(key, [])
            bases = self._bases.get(key, [])
            i = max(bisect.bisect_right(bases, offset) - 1, 0)
            batches, size = [], 0
            for base, n, b in log[i:]:
                if base + n <= offset:
                    continue
                if batches and size + len(b) > maxb:
                    break
                batches.append(b)
                size += len(b)
        record_set = b"".join(batches)
        out = bytearray(struct.pack(">i", corr))
        out += struct.pack(">i", 0)                       # throttle
        out += struct.pack(">i", 1)
        out += _str(topic)
        out += struct.pack(">i", 1)
        out += struct.pack(">ihqq", part, 0, hwm, hwm)
        out += struct.pack(">i", 0)                       # no aborted txns
        out += struct.pack(">i", len(record_set)) + record_set
        return bytes(out)
