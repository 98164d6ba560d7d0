#!/usr/bin/env python
"""Kafka-sink throughput measurement → committed artifact.

Round-5 verdict item 3: BASELINE.md's "fixed-width → Kafka ≥380 MB/s
at 8 cores" row was "unmeasured" because no spark-sql-kafka connector
jar or real broker exists here. This tool measures the two halves the
environment CAN measure, interleaved A/B/A (ceiling_ab methodology)
so VM phases hit every stage equally:

1. **framing** — the Spark-side cost of everything UP TO the producer
   handoff: fixed-width parse → Avro-encode each row → Confluent
   frame (magic + schema id + payload) → drain. That is the bytes/s
   the engine can FEED a Kafka sink; the reference's own toKafka
   stage (README.md:55, 0.595 s) is likewise just the handoff to
   librdkafka, with delivery async. Measured at 4 tasks (reference
   shape) and 32 tasks (this VM's full width).
2. **wire tier** — socket throughput of the pure-Python fallback
   producer (`sinks/kafka_wire.py`) against the in-process toy broker
   over real TCP, labeled as the FALLBACK tier's number: per-row
   Python framing + CRC32C, not the connector path, reported so
   nobody mistakes it for one.

Whatever numbers this artifact records are the numbers BASELINE.md
cites — one source of truth (same contract as tools/ceiling_ab.py).

Usage: python tools/kafka_bench.py [reps] [out.json]
(defaults: 5 reps, KAFKA_BENCH_r9_feed.json, sf dir from
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "KAFKA_BENCH_r9_feed.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from shredder_spark.session import get_spark
    from shredder_spark.sinks.kafka import prepare_kafka_batch
    from shredder_spark.sources.fixedwidth import read_fixed_width
    from shredder_spark.sources.ingest_bench import (
        BENCH_SCHEMA,
        ensure_fixture,
    )

    spark = get_spark("kafka-bench")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = ensure_fixture(spark, sf_dir)
    path, total_bytes = manifest["path"], manifest["bytes"]
    mb = total_bytes / 1e6

    def frame(n_tasks: int):
        df = read_fixed_width(spark, path, BENCH_SCHEMA).coalesce(n_tasks)
        batch = prepare_kafka_batch(df, schema_id=7, key_col="order_key")
        batch.write.format("noop").mode("overwrite").save()

    def parse_only(n_tasks: int):
        # encode-stubbed A/B (round-8 verdict "what's wrong" #4): the
        # same scan+parse+drain with the Avro-encode/frame stage
        # removed — if THIS leg's per-core rate also collapses at 32
        # tasks, the collapse is box saturation (memory bandwidth /
        # hyperthread contention); if it scales while `frame` doesn't,
        # the encode tier is the limit
        df = read_fixed_width(spark, path, BENCH_SCHEMA).coalesce(n_tasks)
        df.write.format("noop").mode("overwrite").save()

    stages = [("frame4", lambda: frame(4)),
              ("parse4", lambda: parse_only(4)),
              ("frame32", lambda: frame(32)),
              ("parse32", lambda: parse_only(32))]

    # warm-up (codegen compile, page cache)
    for _name, fn in stages:
        fn()

    times: dict[str, list[float]] = {name: [] for name, _ in stages}
    for _ in range(reps):
        for name, fn in stages:           # interleaved: phases hit both
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 4))

    def rates(name: str, cores: int) -> dict:
        med = statistics.median(times[name])
        best = min(times[name])
        return {
            "reps_s": times[name],
            "median_s": round(med, 4),
            "mb_per_s_median": round(mb / med, 2),
            "mb_per_s_best": round(mb / best, 2),
            "mb_per_s_per_core_median": round(mb / med / cores, 2),
            "mb_per_s_per_core_best": round(mb / best / cores, 2),
            "cores": cores,
        }

    out = {
        "metric": "kafka_sink_feed_rate",
        "sf_dir": sf_dir,
        "input_bytes": total_bytes,
        "method": (f"interleaved A/B, {reps} reps after warm-up; framing "
                   "= fixed-width parse + per-row Avro encode + Confluent "
                   "frame + drain (the bytes/s the engine can feed a "
                   "Kafka producer; delivery is the broker/network's "
                   "half, absent here)"),
        "framing_4tasks": rates("frame4", 4),
        "framing_32tasks": rates("frame32", 32),
        "parse_only_4tasks": rates("parse4", 4),
        "parse_only_32tasks": rates("parse32", 32),
    }
    # attribution: what the 4→32 per-core collapse measures
    p4, p32 = (statistics.median(times["parse4"]),
               statistics.median(times["parse32"]))
    f4, f32 = (statistics.median(times["frame4"]),
               statistics.median(times["frame32"]))
    parse_scaling = (mb / p32 / 32) / (mb / p4 / 4)
    frame_scaling = (mb / f32 / 32) / (mb / f4 / 4)
    out["attribution"] = {
        "parse_only_per_core_retention_4_to_32": round(parse_scaling, 3),
        "frame_per_core_retention_4_to_32": round(frame_scaling, 3),
        "encode_s_4tasks": round(f4 - p4, 3),
        "encode_s_32tasks": round(f32 - p32, 3),
        "read": ("retention = per-core MB/s at 32 tasks over per-core "
                 "MB/s at 4 tasks (1.0 = perfect scaling). If "
                 "parse-only retains as badly as frame, the collapse "
                 "is the box (32 hyperthreads saturate before 8x the "
                 "4-task bandwidth); the encode_s delta is the Avro "
                 "encode stage's share of wall time at each width."),
    }

    # ---- wire tier (fallback): socket produce vs the in-process broker.
    # Labeled separately: per-row Python + CRC32C, NOT the connector.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from kafka_toy_broker import ToyKafkaBroker

        from shredder_spark.sinks.kafka_wire import KafkaWireProducer

        payload = bytes(256)                       # 256 B framed values
        n_msgs = 40_000
        wire: dict = {"payload_bytes": len(payload), "messages": n_msgs}
        with ToyKafkaBroker() as broker:
            p = KafkaWireProducer(broker.bootstrap)
            reps_s = []
            for _ in range(3):
                t0 = time.perf_counter()
                for i in range(n_msgs):
                    p.send("bench", i & 3, None, payload)
                    if (i + 1) % 10_000 == 0:
                        p.flush()
                p.flush()
                reps_s.append(round(time.perf_counter() - t0, 4))
            med = statistics.median(reps_s)
            wire.update({
                "reps_s": reps_s,
                "median_s": med,
                "mb_per_s_per_conn": round(
                    n_msgs * len(payload) / 1e6 / med, 2),
                "msgs_per_s_per_conn": round(n_msgs / med),
                "note": ("FALLBACK tier: one Python connection, per-row "
                         "framing + CRC32C over real TCP to the toy "
                         "broker. Scales ~linearly with connections "
                         "(one per Spark task in write_kafka_wire); "
                         "the connector path is the production sink."),
            })
        out["wire_tier"] = wire
    except Exception as e:  # pragma: no cover
        out["wire_tier"] = {"error": repr(e)}

    # session-speed stamp (round-6 task 8 convention)
    from shredder_spark.benchcontrol import control_stats
    out["control"] = control_stats(spark)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "method"},
                     default=str)[:600])
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
