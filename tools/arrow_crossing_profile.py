#!/usr/bin/env python
"""Where does the arrow-tier DataFrame parse rate go? (r8 verdict task 8)

INGEST_PROFILE_r8: arrow_parse 71.9 MB/s/core at the 4-task shape vs
the fused tier's Python-side ~196 — so the DataFrame tier loses ~2/3
of the Python parse rate somewhere between `_parse_batch` returning a
RecordBatch and the JVM scan node emitting rows. This tool splits that
loss into its stages, all at the 4-task shape on the same fixture:

1. ``py_parse``   — the reader's read() loop run directly in 4 worker
                    processes (byte-range read → numpy matrix →
                    _parse_batch), no Spark: the Python-side rate.
2. ``py_parse_ipc`` — same plus Arrow IPC-stream serialization of
                    every batch (what the Python worker writes to the
                    JVM socket): isolates the IPC encode share.
3. ``spark_noop[_bXXk]`` — the full DataFrame leg (read →
                    crossing → JVM rows → noop) at several
                    ``batch_rows`` sizes: adds socket transfer + JVM
                    IPC decode + columnar→row conversion.

The remainder (3) − (2) is the JVM-side crossing: if it dominates and
no batch size moves it, the crossing is irreducible from Python and
the artifact records that conclusion (the fused tier exists precisely
because it never crosses).

Usage: python tools/arrow_crossing_profile.py [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = 4


def _py_parse_split(args) -> int:
    """One worker: parse a slice of the byte-range splits; returns
    bytes processed. ``ipc=True`` additionally serializes every batch
    to an Arrow IPC stream (the Python→JVM wire format)."""
    path, schema_json, split_idx, n_workers, ipc = args
    import io

    import pyarrow as pa

    from shredder_spark.sources.fixedwidth_arrow import (
        FixedWidthArrowReader, parse_avro_fixed_schema)

    fixed = parse_avro_fixed_schema(schema_json)
    rdr = FixedWidthArrowReader(
        {"path": path, "cores": str(TASKS)}, fixed)
    done = 0
    for i, part in enumerate(rdr.partitions()):
        if i % n_workers != split_idx:
            continue
        if ipc:
            sink = io.BytesIO()
            writer = None
            for batch in rdr.read(part):
                if writer is None:
                    writer = pa.ipc.new_stream(sink, batch.schema)
                writer.write_batch(batch)
            if writer is not None:
                writer.close()
        else:
            for _batch in rdr.read(part):
                pass
        done += part.end - part.start
    return done


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ARROW_CROSSING_r9.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from shredder_spark.benchcontrol import GapControl
    from shredder_spark.session import get_spark
    from shredder_spark.sources.fixedwidth_arrow import (
        read_fixed_width_arrow_ds)
    from shredder_spark.sources.ingest_bench import BENCH_SCHEMA, \
        ensure_fixture

    spark = get_spark("arrow-crossing-profile")
    spark.sparkContext.setLogLevel("ERROR")
    man = ensure_fixture(spark, sf_dir)
    path, total = man["path"], man["bytes"]
    mb = total / 1e6
    sj = json.dumps(BENCH_SCHEMA)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    pool = ProcessPoolExecutor(max_workers=TASKS)

    def py_parse(ipc: bool):
        args = [(path, sj, i, TASKS, ipc) for i in range(TASKS)]
        assert sum(pool.map(_py_parse_split, args)) >= total * 0.99

    def spark_leg(batch_rows: int):
        # the JVM converts each arrow batch; maxRecordsPerBatch caps
        # re-batching on the worker side, keep them aligned
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_rows))
        noop(read_fixed_width_arrow_ds(spark, path, sj, cores=32,
                                       batch_rows=batch_rows)
             .coalesce(TASKS))

    stages = {
        "py_parse": lambda: py_parse(False),
        "py_parse_ipc": lambda: py_parse(True),
        "spark_noop_b64k": lambda: spark_leg(65536),
        "spark_noop_b256k": lambda: spark_leg(262144),
        "spark_noop_b16k": lambda: spark_leg(16384),
    }
    ctl = GapControl(spark, per_gap=2, every=1)
    for fn in stages.values():  # warm-up
        fn()
    times: dict[str, list[float]] = {k: [] for k in stages}
    ctl.gap()
    for _ in range(reps):
        for name, fn in stages.items():  # interleaved
            t0 = time.perf_counter()
            fn()
            times[name].append(round(time.perf_counter() - t0, 4))
            ctl.gap()
    pool.shutdown()

    def per_core(name: str) -> dict:
        med = statistics.median(times[name])
        return {"reps_s": times[name], "median_s": round(med, 4),
                "mb_per_s_per_core_median": round(mb / med / TASKS, 2),
                "mb_per_s_per_core_best":
                    round(mb / min(times[name]) / TASKS, 2)}

    out = {
        "metric": "arrow_crossing_profile",
        "sf_dir": sf_dir,
        "input_bytes": total,
        "tasks": TASKS,
        "stages": {k: per_core(k) for k in stages},
    }
    # stage attribution in per-MB-per-core seconds
    def spmb(name):
        return statistics.median(times[name]) * TASKS / mb
    best_spark = min(("spark_noop_b16k", "spark_noop_b64k",
                      "spark_noop_b256k"), key=spmb)
    out["attribution_s_per_mb_per_core"] = {
        "python_parse": round(spmb("py_parse"), 5),
        "ipc_encode": round(spmb("py_parse_ipc") - spmb("py_parse"), 5),
        "jvm_crossing_plus_rows": round(
            spmb(best_spark) - spmb("py_parse_ipc"), 5),
        "best_spark_leg": best_spark,
    }
    out["control"] = ctl.stamp()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"stages": {k: v["mb_per_s_per_core_median"]
                                 for k, v in out["stages"].items()},
                      "attribution": out["attribution_s_per_mb_per_core"],
                      "control": out["control"]}, default=str))
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
