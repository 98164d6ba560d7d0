#!/usr/bin/env python
"""Round-12 ingest profile: honest-shape measurement of the BASELINE
bar (r11 verdict What's wrong #1 / What to do #1-2).

The r8-r11 "fused tier at the 4-task shape" numbers were produced by
a wrong-shape run: `fixed_width_to_avro_fused` parallelized one task
per fixture FILE (32), not per requested task (4), so every committed
per-core figure was a 32-task saturated total divided by 4. The
packing is fixed (sinks/avro_vec.py); this tool re-measures with the
shape ASSERTED, not assumed:

1. a sampler thread polls `sc.statusTracker()` during every leg and
   records the PEAK number of concurrently-active tasks — the
   artifact carries it per leg, and the fused leg hard-fails if its
   peak exceeds the requested task count;
2. a single-core stage split of the fused pipeline (no Spark): raw
   read -> numpy matrix -> arrow parse -> wire -> avro encode ->
   snappy -> write, each timed separately. This is the physics the
   4-task number must compose from (stages run sequentially per
   batch in one task, so rates compose harmonically) and the fast
   feedback loop for optimizing the encode leg.

Legs (interleaved reps, all at the 4-task shape, control-stamped):
expr_parse / arrow_parse / serializer_ceiling / expr_avro /
arrow_avro / fused_avro — same menu as INGEST_PROFILE_r8.json so the
two artifacts read side by side; that artifact's fused row is
superseded by this one (wrong shape, retained for history).

Usage: python tools/ingest_profile_r12.py [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = 4


class PeakTasks:
    """Polls the status tracker while a leg runs; records the peak
    count of concurrently-active tasks across all active stages."""

    def __init__(self, sc, interval: float = 0.02):
        self._tracker = sc.statusTracker()
        self._interval = interval
        self.peak = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def __enter__(self):
        self._stop.clear()
        self.peak = 0
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def _poll(self):
        while not self._stop.is_set():
            active = 0
            try:
                for sid in self._tracker.getActiveStageIds():
                    info = self._tracker.getStageInfo(sid)
                    if info is not None:
                        active += info.numActiveTasks
            except Exception:
                pass
            if active > self.peak:
                self.peak = active
            time.sleep(self._interval)

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()
        return False


def single_core_stage_split(path: str, schema_json: str,
                            reps: int = 3) -> dict:
    """Time each fused-pipeline stage on ONE file, one core, no Spark.
    Returns per-stage MB/s (input-byte basis) + the harmonic
    composition the 4-task end-to-end must land near."""
    import glob

    import pyarrow as pa

    from shredder_spark.avro_schema import parse_avro_fixed_schema
    from shredder_spark.sinks.avro import spark_schema_to_avro
    from shredder_spark.sinks.avro_codec import RecordCodec, compress_block
    from shredder_spark.sinks.avro_vec import (
        encode_batch, wire_batch, write_ocf_arrow)
    from shredder_spark.sources.fixedwidth_arrow import (
        FixedWidthArrowReader, _parse_batch)

    fs = parse_avro_fixed_schema(schema_json)
    avro_schema = spark_schema_to_avro(fs.to_struct_type())
    rc = RecordCodec(avro_schema)
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    fpath = files[0]
    nbytes = os.path.getsize(fpath)
    mb = nbytes / 1e6
    rdr = FixedWidthArrowReader({"path": fpath, "cores": "1"}, fs)
    batch_rows = 65536

    def timed(fn, reps=reps):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    with open(fpath, "rb") as fh:
        raw = fh.read()  # warm the page cache before timing
    t_read, raw = timed(lambda: open(fpath, "rb").read())
    t_matrix, mat = timed(lambda: rdr._matrix(raw))

    def parse_all():
        return [_parse_batch(mat[j:j + batch_rows], fs)
                for j in range(0, mat.shape[0], batch_rows)]
    t_parse, batches = timed(parse_all)

    def wire_all():
        return [wire_batch(b) for b in batches]
    t_wire, wired = timed(wire_all)

    def encode_all():
        return [encode_batch(rc, b) for b in wired]
    t_encode, payloads = timed(encode_all)

    t_snappy, comped = timed(
        lambda: [compress_block("snappy", p) for p in payloads])

    out_path = os.path.join("/dev/shm" if os.path.isdir("/dev/shm")
                            else "/tmp", "ingest_r12_stage.avro")

    def write_all():
        with open(out_path, "wb") as fh:
            for c in comped:
                fh.write(c)
        return None
    t_write, _ = timed(write_all)

    # end-to-end single core, the exact task body (matrix parse is
    # re-run from raw so nothing is amortized away)
    def fused_once():
        m = rdr._matrix(raw)
        with open(out_path, "wb") as fh:
            write_ocf_arrow(
                fh, rc,
                (wire_batch(_parse_batch(m[j:j + batch_rows], fs))
                 for j in range(0, m.shape[0], batch_rows)),
                codec="snappy")
    t_fused, _ = timed(lambda: (fused_once(), None)[1])
    os.unlink(out_path)

    stages = {
        "read": t_read, "matrix": t_matrix, "arrow_parse": t_parse,
        "wire": t_wire, "avro_encode": t_encode, "snappy": t_snappy,
        "write": t_write,
    }
    total = sum(stages.values())
    return {
        "file": fpath, "bytes": nbytes, "batch_rows": batch_rows,
        "stage_seconds": {k: round(v, 4) for k, v in stages.items()},
        "stage_mb_per_s": {k: round(mb / v, 1) for k, v in stages.items()},
        "sum_of_stages_s": round(total, 4),
        "sum_of_stages_mb_per_s": round(mb / total, 1),
        "fused_end_to_end_s": round(t_fused, 4),
        "fused_end_to_end_mb_per_s": round(mb / t_fused, 1),
    }


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "INGEST_PROFILE_r12.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from shredder_spark.benchcontrol import control_stats
    from shredder_spark.session import get_spark
    from shredder_spark.sinks.avro import AVRO_FORMAT, have_spark_avro
    from shredder_spark.sinks.avro_vec import fixed_width_to_avro_fused
    from shredder_spark.sources.fixedwidth import read_fixed_width
    from shredder_spark.sources.fixedwidth_arrow import (
        read_fixed_width_arrow_ds)
    from shredder_spark.sources.ingest_bench import (
        BENCH_BASE, BENCH_SCHEMA, ensure_fixture)

    spark = get_spark("ingest-profile-r12")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    man = ensure_fixture(spark, sf_dir)
    path, total = man["path"], man["bytes"]
    mb = total / 1e6
    sj = json.dumps(BENCH_SCHEMA)
    avro_out = os.path.join(BENCH_BASE, "avro_profile_r12")
    assert have_spark_avro(spark)

    stage_split = single_core_stage_split(path, sj)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def avro(df):
        (df.write.format(AVRO_FORMAT).option("compression", "snappy")
         .mode("overwrite").save(avro_out))

    typed = read_fixed_width(spark, path, BENCH_SCHEMA)
    ceiling_in = typed.select(*reversed(typed.columns)) \
        .coalesce(TASKS).cache()
    noop(ceiling_in)  # fill, untimed

    stages = {
        "expr_parse": lambda: noop(
            read_fixed_width(spark, path, BENCH_SCHEMA).coalesce(TASKS)),
        "arrow_parse": lambda: noop(
            read_fixed_width_arrow_ds(spark, path, sj, cores=32)
            .coalesce(TASKS)),
        "serializer_ceiling": lambda: avro(ceiling_in),
        "expr_avro": lambda: avro(
            read_fixed_width(spark, path, BENCH_SCHEMA).coalesce(TASKS)),
        "arrow_avro": lambda: avro(
            read_fixed_width_arrow_ds(spark, path, sj, cores=32)
            .coalesce(TASKS)),
        "fused_avro": lambda: fixed_width_to_avro_fused(
            spark, path, BENCH_SCHEMA,
            os.path.join(BENCH_BASE, "avro_fused_r12"), tasks=TASKS),
    }
    peaks: dict[str, int] = {k: 0 for k in stages}
    for name, fn in stages.items():  # warm-up, also records a peak
        with PeakTasks(sc) as pt:
            fn()
        peaks[name] = max(peaks[name], pt.peak)
    times: dict[str, list[float]] = {k: [] for k in stages}
    for _ in range(reps):
        for name, fn in stages.items():  # interleaved
            with PeakTasks(sc) as pt:
                t0 = time.perf_counter()
                fn()
                times[name].append(round(time.perf_counter() - t0, 4))
            peaks[name] = max(peaks[name], pt.peak)
    ceiling_in.unpersist()

    # the shape assertion the r8 artifact lacked: the bar-carrying
    # fused leg must actually run at the requested task count
    assert peaks["fused_avro"] <= TASKS, (
        f"fused leg ran {peaks['fused_avro']} concurrent tasks, "
        f"requested {TASKS} — shape error, number not comparable")

    def per_core(name: str) -> dict:
        med = statistics.median(times[name])
        return {"reps_s": times[name], "median_s": round(med, 4),
                "peak_active_tasks": peaks[name],
                "mb_per_s_per_core_median": round(mb / med / TASKS, 2),
                "mb_per_s_per_core_best":
                    round(mb / min(times[name]) / TASKS, 2)}

    out = {
        "metric": "ingest_profile_r12",
        "sf_dir": sf_dir,
        "input_bytes": total,
        "tasks": TASKS,
        "method": (f"interleaved {reps} reps after warm-up; every leg "
                   f"at the {TASKS}-task shape with statusTracker "
                   "peak-active-task recording (r12: the r8 fused leg "
                   "ran one task per fixture file — 32 — and divided "
                   "by 4; superseded)"),
        "single_core_stage_split": stage_split,
        "stages": {k: per_core(k) for k in stages},
    }
    # harmonic composition: parse-side = matrix+arrow_parse+wire,
    # encode-side = encode+snappy+write (+read) — all sequential in
    # one task, so the end-to-end rate is the inverse-sum
    ss = stage_split["stage_mb_per_s"]
    inv = sum(1.0 / ss[k] for k in
              ("read", "matrix", "arrow_parse", "wire",
               "avro_encode", "snappy", "write"))
    out["harmonic_check_fused"] = {
        "single_core_predicted": round(1.0 / inv, 1),
        "single_core_measured":
            stage_split["fused_end_to_end_mb_per_s"],
        "four_task_per_core_measured":
            out["stages"]["fused_avro"]["mb_per_s_per_core_median"],
    }
    out["control"] = control_stats(spark)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"peaks": peaks,
                      "fused": out["stages"]["fused_avro"],
                      "stage_split_mb_per_s": ss,
                      "harmonic": out["harmonic_check_fused"]}))
    print("written:", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
