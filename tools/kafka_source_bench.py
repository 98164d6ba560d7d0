#!/usr/bin/env python
"""Kafka-SOURCE throughput measurement → committed artifact.

Round-7 verdict task 8: the ``format("kafkawire")`` source has parity
and restart tests but no committed rows/s number. This measures batch
and streaming consume against the in-process toy broker over real TCP
sockets, beside the r6 sink-side numbers (KAFKA_BENCH_r6.json):

1. **batch consume** — ``spark.read.format("kafkawire")`` at 4 and 32
   Kafka partitions (one executor task + one socket per partition,
   the librdkafka per-handle shape). Executor-side fetch: this is the
   distributed tier.
2. **streaming consume** — ``spark.readStream.format("kafkawire")``
   with ``trigger(availableNow=True)`` and a fresh checkpoint per rep
   (full-log replay). The simple stream reader prefetches
   driver-side BY DESIGN (jar-less fallback tier; documented in
   kafka_wire_datasource.py), so its number is a fallback-tier
   number, not the 100 TB hot path — labeled as such.

Both legs are per-row Python framing + CRC32C over the public wire
protocol; the connector jar (absent here) is the production path.
Stamped with the frozen session-speed control like every artifact.

Usage: python tools/kafka_source_bench.py [reps] [out.json]
(defaults: 3 reps, KAFKA_BENCH_r8.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PAYLOAD = bytes(256)
N_MSGS = 100_000


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "KAFKA_BENCH_r8.json"

    from kafka_toy_broker import ToyKafkaBroker

    from shredder_spark.benchcontrol import control_stats
    from shredder_spark.session import get_spark
    from shredder_spark.sinks.kafka_wire import KafkaWireProducer
    from shredder_spark.sources.kafka_wire_datasource import (
        register_kafkawire_source)

    spark = get_spark("kafka-source-bench")
    spark.sparkContext.setLogLevel("ERROR")
    register_kafkawire_source(spark)

    out: dict = {
        "metric": "kafka_source_consume_rate",
        "payload_bytes": len(PAYLOAD),
        "messages": N_MSGS,
        "method": (f"in-process toy broker over real TCP; {reps} reps "
                   "after warm-up; batch = one task+socket per Kafka "
                   "partition (executor-side), streaming = availableNow "
                   "full-log replay with a fresh checkpoint per rep "
                   "(driver-side prefetch, fallback tier)"),
        "sink_side": "KAFKA_BENCH_r6.json",
    }
    mb = N_MSGS * len(PAYLOAD) / 1e6

    with ToyKafkaBroker() as broker:
        # ---- produce the fixture logs once per partition layout
        for n_parts, topic in ((4, "bench4"), (32, "bench32")):
            p = KafkaWireProducer(broker.bootstrap)
            for i in range(N_MSGS):
                p.send(topic, i % n_parts, None, PAYLOAD)
                if (i + 1) % 20_000 == 0:
                    p.flush()
            p.flush()

        def batch(topic: str, n_parts: int) -> None:
            df = (spark.read.format("kafkawire")
                  .option("bootstrap", broker.bootstrap)
                  .option("topic", topic)
                  .option("partitions",
                          ",".join(str(i) for i in range(n_parts)))
                  .load())
            df.write.format("noop").mode("overwrite").save()

        import tempfile

        def stream(topic: str, n_parts: int) -> None:
            with tempfile.TemporaryDirectory() as ckpt:
                q = (spark.readStream.format("kafkawire")
                     .option("bootstrap", broker.bootstrap)
                     .option("topic", topic)
                     .option("partitions",
                             ",".join(str(i) for i in range(n_parts)))
                     .load()
                     .writeStream.format("noop")
                     .option("checkpointLocation", ckpt)
                     .trigger(availableNow=True).start())
                q.awaitTermination(300)

        stages = [("batch4", lambda: batch("bench4", 4), 4),
                  ("batch32", lambda: batch("bench32", 32), 32),
                  ("stream4", lambda: stream("bench4", 4), 4)]

        for _name, fn, _c in stages:     # warm-up
            fn()
        times: dict[str, list[float]] = {n: [] for n, _, _ in stages}
        for _ in range(reps):
            for name, fn, _c in stages:  # interleaved
                t0 = time.perf_counter()
                fn()
                times[name].append(round(time.perf_counter() - t0, 4))

        for name, _fn, cores in stages:
            med = statistics.median(times[name])
            best = min(times[name])
            out[name] = {
                "reps_s": times[name],
                "median_s": round(med, 4),
                "msgs_per_s_median": round(N_MSGS / med),
                "msgs_per_s_best": round(N_MSGS / best),
                "mb_per_s_median": round(mb / med, 2),
                "mb_per_s_best": round(mb / best, 2),
                "tasks": cores,
            }

    out["control"] = control_stats(spark)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("batch4", "batch32", "stream4", "control")},
                     default=str)[:800])
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
