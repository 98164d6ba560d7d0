"""Scale-robustness sweep: sf0.01 -> sf0.1 -> sf1 -> sf10 -> sf100
(four decades, THREE measured 10x steps above the driver data; the
sf100 leg is the round-9 third-decade probe — 600 M-row lineitem,
5 M-doc corpus).

Evidence for the 100 TB posture that a single-sf bench can't give:
per-query wall-time slopes across 10x data steps, the LSH
candidate-count slope for the dedup tiers (the quantity that must stay
~linear for the banding design to survive scale-up), and a DuckDB
oracle re-check of the oracle-paired headline queries at sf1.

sf1 is derived by tools/make_sf1.py (bench-only data — see its
docstring for the replica construction that keeps near-dup density
scale-invariant). Run:

    python tools/make_sf1.py && python tools/scale_sweep.py > SCALE_SWEEP.json

sf10 is the same construction with SHREDDER_SF_REPLICAS=100 (round-8
second-decade probe); its leg is skipped when the directory is absent:

    SHREDDER_SF_REPLICAS=100 SHREDDER_SF1_DIR=/tmp/shredder_sf10 \
        python tools/make_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Size the single-JVM heap to the largest leg BEFORE the JVM starts:
# sf10's 60 M-row window/sort tasks at 32 threads need cluster-realistic
# execution memory (~1.5 GB/core, what an executor actually ships with).
# The 8g default (256 MB/core) measures spill behavior, not the
# operator — the box has 128 GiB, so the honest shape is affordable.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

import duckdb

from shredder_spark import queries as queries_mod
from shredder_spark.catalog import TABLES, load_table
from shredder_spark.session import get_spark

SF_DIRS = {
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "1": os.environ.get("SHREDDER_SF1_DIR", "/tmp/shredder_sf1"),
    "10": os.environ.get("SHREDDER_SF10_DIR", "/tmp/shredder_sf10"),
    "100": os.environ.get("SHREDDER_SF100_DIR", "/tmp/shredder_sf100"),
}
_only = os.environ.get("SWEEP_SFS")
if _only:
    keep = {x.strip() for x in _only.split(",")}
    SF_DIRS = {k: v for k, v in SF_DIRS.items() if k in keep}

TIMED = [
    "q01_scan_count",
    "q421_grouped_rank_scale",
    "q05_inner_join",
    "q15_pricing_summary",
    "q21_ranking_windows",
    "q50_term_frequency",
    "q110_minhash_dedup_full",
    "q115_simhash_pairs",
    "q140_bm25_search",
    "q355_exact_substring_spans",
]

# headline queries with a DuckDB oracle — re-checked at sf1
ORACLE_CHECK = ["q01_scan_count", "q05_inner_join", "q15_pricing_summary",
                "q21_ranking_windows", "q421_grouped_rank_scale",
                "q50_term_frequency", "q140_bm25_search"]


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _norm(rows):
    return sorted(tuple(str(round(v, 6)) if isinstance(v, float) else str(v)
                        for v in r) for r in rows)


def _rows_equal(a_rows, b_rows) -> bool:
    """Order-insensitive compare with float tolerance: SUM over 6e8
    doubles drifts ~1e-13 rel between engines from partial-sum order
    alone (measured on q15 at sf100) — a 6-decimal string compare is
    specious at that magnitude; 1e-9 rel matches compare_query."""
    from tests.oracle_utils import _values_equal
    if len(a_rows) != len(b_rows):
        return False
    ka = sorted(a_rows, key=lambda r: tuple(str(v) for v in r))
    kb = sorted(b_rows, key=lambda r: tuple(str(v) for v in r))
    return all(len(ra) == len(rb)
               and all(_values_equal(x, y) for x, y in zip(ra, rb))
               for ra, rb in zip(ka, kb))


def _checkpoint(out: dict) -> None:
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out | {"partial": True}, fh)


def main() -> None:
    spark = get_spark("shredder-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    from shredder_spark.benchcontrol import GapControl
    ctl = GapControl(spark, per_gap=2, every=1)
    reg = queries_mod.registry()
    out: dict = {"metric": "scale_sweep", "sfs": {}}

    for sf, sf_dir in SF_DIRS.items():
        if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
            print(f"skip sf{sf}: {sf_dir} missing", file=sys.stderr)
            continue
        stats: dict = {"dir": sf_dir}
        print(f"== sf{sf} leg start", file=sys.stderr, flush=True)
        stats["rows"] = {
            "lineitem": load_table(spark, sf_dir, "lineitem").count(),
            "documents": load_table(spark, sf_dir, "documents").count(),
        }
        # bracketing control gaps around every rep (round-8 verdict
        # task 3): each rep normalizes by ITS local gap pair, so a VM
        # phase hits the rep and its divisor together
        timings: dict = {}
        timings_norm: dict = {}
        n_reps = int(os.environ.get(
            "SWEEP_REPS", "1" if sf == "100" else "2"))
        skip = {x for x in os.environ.get("SWEEP_SKIP", "").split(",") if x}
        for name in [n for n in TIMED if n not in skip]:
            print(f"  timing {name}", file=sys.stderr, flush=True)
            _drain(reg[name].run(spark, sf_dir))  # warm-up / codegen
            ctl.gap()
            best = best_norm = None
            for _ in range(n_reps):
                gi = ctl.gap_index()
                t0 = time.perf_counter()
                _drain(reg[name].run(spark, sf_dir))
                dt = time.perf_counter() - t0
                ctl.gap()
                best = dt if best is None else min(best, dt)
                dn = dt / ctl.local_vs_ref(gi)
                best_norm = dn if best_norm is None else min(best_norm, dn)
            timings[name] = round(best, 3)
            timings_norm[name] = round(best_norm, 3)
        stats["timings"] = timings
        stats["timings_norm"] = timings_norm

        # LSH internals: candidate pairs before exact verification, and
        # verified pairs — the scale-critical quantities for q110
        from shredder_spark.operators.dedup import minhash_lsh_pairs
        print("  minhash internals", file=sys.stderr, flush=True)
        docs = load_table(spark, sf_dir, "documents")
        stats["minhash_candidates"] = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, verify=False).count()
        stats["minhash_pairs"] = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8).count()

        from shredder_spark.operators.substring_dedup import (
            duplicate_substring_spans)
        print("  substr spans", file=sys.stderr, flush=True)
        stats["substr_spans"] = duplicate_substring_spans(
            docs.select("doc_id", "text"), min_len=60).count()

        # incremental near-dup tier: 4 arrival batches vs one batch
        # dedup — admitted-set equality plus the incremental overhead
        # ratio (state join cost amortized per batch). sf0.01/sf0.1
        # compare UNCAPPED (the strictest contract); at sf1 the
        # derived cross-replica band collisions make uncapped in-array
        # pair generation blow the heap, so sf1 compares the CAPPED
        # production shape: batch with max_bucket_size=200 vs the
        # incremental fed the matching oversized-bucket blocklist —
        # both tiers then decide over the same pair universe
        # (operators/dedup.py::oversized_lsh_buckets).
        import shutil
        import tempfile

        import pyspark.sql.functions as F

        from shredder_spark.operators.dedup import (
            dedupe_keepers, oversized_lsh_buckets)
        from shredder_spark.streaming.neardup import IncrementalNearDup

        lsh = dict(num_perm=64, bands=16, threshold=0.5, seed=1)
        src = docs.select("doc_id", "text")
        cap = 200 if sf in ("1", "10", "100") else 10**9
        blocklist = None
        if sf in ("1", "10", "100"):
            blocklist = oversized_lsh_buckets(
                src, "doc_id", "text", max_bucket_size=cap,
                num_perm=lsh["num_perm"], bands=lsh["bands"],
                seed=lsh["seed"]).localCheckpoint(eager=True)
        print("  batch dedup", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        keepers = {r.doc_id for r in dedupe_keepers(
            src, "doc_id", "text", max_bucket_size=cap, **lsh).collect()}
        batch_s = time.perf_counter() - t0
        if os.environ.get("SWEEP_SKIP_INCREMENTAL"):
            # the 8-batch incremental exhibit is the most expensive leg
            # at a new decade; its flatness is pinned through sf10
            # (SCALE_SWEEP_r8) — skippable when the probe's goal is the
            # timed headliners + oracle checks
            stats["neardup_batch_s"] = round(batch_s, 3)
            stats["neardup_keepers"] = len(keepers)
            stats["neardup_contract"] = "incremental-skipped"
            out["sfs"][sf] = stats
            _checkpoint(out)
            continue
        state = tempfile.mkdtemp(prefix=f"neardup_sweep_{sf}_")
        try:
            # 8 arrival batches (round-6 verdict item 4): enough to
            # exercise auto-compaction (compact_every=4 here) and to
            # show the per-batch cost stays flat as epochs accumulate
            # — the partitioned epoch=/pb= state layout keeps the
            # file-listing and scan overhead bounded.
            n_batches = 8
            op = IncrementalNearDup(spark, state,
                                    exclude_buckets=blocklist,
                                    compact_every=4, **lsh)
            ids = sorted(r.doc_id for r in src.select("doc_id").collect())
            cuts = [ids[len(ids) * k // n_batches]
                    for k in range(1, n_batches)] + [ids[-1] + 1]
            admitted: set = set()
            lo = ids[0]
            batch_times: list = []
            t0 = time.perf_counter()
            for hi in cuts:
                tb = time.perf_counter()
                b = src.filter((F.col("doc_id") >= lo)
                               & (F.col("doc_id") < hi))
                admitted |= {r.doc_id for r in op.process_batch(b).collect()}
                batch_times.append(round(time.perf_counter() - tb, 3))
                lo = hi
            inc_s = time.perf_counter() - t0
        finally:
            shutil.rmtree(state, ignore_errors=True)
        stats["neardup_batch_s"] = round(batch_s, 3)
        stats["neardup_incremental_s"] = round(inc_s, 3)
        stats["neardup_per_batch_s"] = batch_times
        # flatness: last-quarter mean over second-quarter mean (first
        # batch excluded: no state yet). ~1.0 = flat overhead; state
        # volume itself grows with seen docs, so a mild upslope at
        # larger sf is the scan, not file accumulation.
        q2 = batch_times[2:4]
        q4 = batch_times[6:8]
        stats["neardup_flatness_last_over_mid"] = round(
            (sum(q4) / len(q4)) / max(sum(q2) / len(q2), 1e-9), 3)
        stats["neardup_equal"] = bool(admitted == keepers)
        stats["neardup_keepers"] = len(keepers)
        stats["neardup_contract"] = (
            "capped-200+blocklist" if sf in ("1", "10", "100")
            else "uncapped")
        out["sfs"][sf] = stats

        # incremental checkpoint: a kill late in the run must not lose
        # the finished legs (r9: the first sf100 attempt died at the
        # box-OOM 75 min in, taking the whole artifact with it)
        _checkpoint(out)

    # oracle re-check at the derived sfs (engine vs DuckDB on the
    # same derived files)
    for sf_label in ("1", "10", "100"):
        sfd = SF_DIRS.get(sf_label, "/nonexistent")
        if not os.path.exists(os.path.join(sfd, "lineitem.parquet")):
            continue
        from tests.oracle_utils import duckdb_connect
        con = duckdb_connect(sfd)  # capped memory + spill dir (r9)
        oracle_ok: dict = {}
        for name in ORACLE_CHECK:
            print(f"  oracle check sf{sf_label} {name}",
                  file=sys.stderr, flush=True)
            q = reg[name]
            eng = q.run(spark, sfd)
            n_eng = eng.count()
            if n_eng > 2_000_000:
                # full value-collect of a multi-million-row result
                # blows driver.maxResultSize and proves little beyond
                # the smaller sfs' value match — compare counts here
                from tests.oracle_utils import count_only_sql
                n_ora = con.execute(count_only_sql(q.oracle)).fetchone()[0]
                oracle_ok[name] = f"count_only:{bool(n_eng == n_ora)}"
                continue
            s = eng.collect()
            o = con.execute(q.oracle).fetchall()
            oracle_ok[name] = bool(_rows_equal(s, o)
                                   or _norm(s) == _norm(o))
        out[f"oracle_at_sf{sf_label}"] = oracle_ok

    # decade slopes: time ratio per 10x rows (1.0 = perfectly linear)
    sfs = out["sfs"]
    for lo, hi, key in (("0.1", "1", "x10_ratios"),
                        ("1", "10", "x10_ratios_sf1_to_sf10"),
                        ("10", "100", "x10_ratios_sf10_to_sf100")):
        if lo in sfs and hi in sfs:
            slopes = {}
            for name in TIMED:
                a = sfs[lo]["timings"].get(name)
                b = sfs[hi]["timings"].get(name)
                slopes[name] = round(b / a, 2) if a and b else None
            slopes["minhash_candidates"] = round(
                sfs[hi]["minhash_candidates"]
                / max(sfs[lo]["minhash_candidates"], 1), 2)
            out[key] = slopes

    # session-speed stamp: bracketed gaps across the whole run
    # (round-6 task 8; upgraded to GapControl in r9)
    out["control"] = ctl.stamp()
    out["session"] = {
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "initial_shuffle_partitions": spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            None),
    }
    out.pop("partial", None)
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
