"""Engine-side runtime profile of the full registry at a given sf.

The oracle sweeps prove correctness but don't time the Spark side in
isolation; this tool runs EVERY registry query (engine plan only, no
DuckDB) and records wall time per query, so the slowest plans can be
audited for scale problems ("would this survive another 100x?") with
data instead of intuition.

    python tools/profile_queries.py [sf_dir] [warm_top_n] > QUERY_PROFILE.json

Round-9 instrument upgrades (round-8 verdict tasks 3 and 5):
- **bracketing control** — a 2-rep control gap every 25 queries
  (benchcontrol.GapControl), artifact stamped with the 20 %-trimmed
  core over all gap reps; each query also records a locally-normalized
  time (``topN_norm``) so a VM phase mid-run is visible and divisible.
- **steady-state column** — the cold pass is a single shot (includes
  codegen compile + first-touch page cache); the slowest
  ``warm_top_n`` (default 40) queries are re-run warm (min of 2) into
  ``topN_warm``, so cross-decade ratios can compare like regimes
  (round 8's q110 read 113 s cold vs 11.3 s warmed — the regime split
  confounded ratios).

Results are collected via count() on the final DataFrame (forces full
execution of every operator without driver-side materialization of
wide rows).

CAVEAT (r11): count() is subject to Catalyst column pruning — window
operators whose outputs feed nothing downstream are REMOVED under a
bare count, so a pure-window-over-scan row (q21-class) times the
scan+count, not the sort (q21 at sf100: 5.2 s here vs ~28 min for
its value run). bench.py's noop-write drain does not prune; the
window family's real scale behavior is carried by the value-compared
sweeps and the grouped-rank tier timings. The profile keeps count()
for cross-decade comparability with the r8–r10 artifacts.

Round-10 upgrades (r9 verdict task 1 — the sf100 full profile):
- ``SWEEP_SHARD=i/k`` runs the i-th of k deterministic name-sorted
  round-robin shards (same protocol as oracle_sweep_full.py) so the
  third-decade profile fits inside a round; merge with
  tools/merge_profile_shards.py (+ quiet-box control stamps from
  tools/quiet_control.py — in-shard gaps are contended).
- ``SWEEP_THREADS`` / ``SWEEP_DRIVER_MEM`` size the per-shard session
  (sf100 shards: 8 threads / 24g each, 4 concurrent).
- the artifact now carries the FULL per-query ``times`` (and
  ``times_norm``) maps, not just top30 — cross-decade slope analysis
  needs every query, and the merge needs the union.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from shredder_spark import queries as queries_mod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shredder_sf1"
WARM_TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def main() -> None:
    shard = os.environ.get("SWEEP_SHARD")
    n_threads = int(os.environ.get("SWEEP_THREADS", "16"))
    driver_mem = os.environ.get("SWEEP_DRIVER_MEM", "24g")
    # Initial shuffle partitioning: AQE coalesces small queries back
    # down, but the INITIAL count bounds per-task state on the big
    # ones — at sf100 a fact-fact join at shuffle.partitions=8 builds
    # 75 M-row per-task sort arrays, whose 1 GB contiguous allocations
    # abort the JVM under GC pressure (r10 finding: q173/TPC-H Q21
    # killed a 24g shard). Default stays = threads; big-sf runs pass
    # SWEEP_SHUFFLE_PARTITIONS=64.
    shuffle_parts = os.environ.get("SWEEP_SHUFFLE_PARTITIONS",
                                   str(n_threads))
    spark = (SparkSession.builder.master(f"local[{n_threads}]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", shuffle_parts)
             .config("spark.driver.memory", driver_mem)
             .config("spark.driver.maxResultSize", "8g")
             # shuffle files of finished queries are deleted by
             # ContextCleaner only after their RDDs are GC'd — on a
             # big heap that can lag many queries behind, and at sf100
             # several concurrent shards' stale spill overran the disk
             # (r10 finding). Force the cleanup cycle frequently.
             .config("spark.cleaner.periodicGC.interval", "2min")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from shredder_spark.benchcontrol import GapControl
    ctl = GapControl(spark, per_gap=2, every=25)
    reg = queries_mod.registry()
    names = sorted(reg)
    if shard:
        i, k = (int(x) for x in shard.split("/"))
        names = [n for j, n in enumerate(names) if j % k == i]
    only = os.environ.get("SWEEP_ONLY")
    if only:
        # r11: targeted re-profile of named rows (error-row retirement
        # / post-fix re-timing) — merged back with patch_profile_rows
        want = [n for n in only.split(",") if n]
        missing = [n for n in want if n not in reg]
        assert not missing, f"SWEEP_ONLY names not in registry: {missing}"
        names = [n for n in names if n in set(want)]
    skip_path = os.environ.get("SWEEP_SKIP")
    if skip_path:
        # resume support: names already timed by a prior (crashed)
        # attempt, one per line — the relaunch runs only the rest and
        # the two partial artifacts are unioned before the shard merge
        with open(skip_path) as fh:
            done = {ln.strip() for ln in fh if ln.strip()}
        names = [n for n in names if n not in done]
    times: dict[str, float] = {}
    gidx: dict[str, int] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for name in names:
        q = reg[name]
        ctl.maybe_gap()
        gidx[name] = ctl.gap_index()
        t = time.time()
        try:
            q.run(spark, SF_DIR).count()
            times[name] = round(time.time() - t, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:150]
        msg = "" if name not in errors else f" :: {errors[name][:110]}"
        print(f"{name} {times.get(name, 'ERR')}{msg}", file=sys.stderr)
    ctl.gap()
    ranked = sorted(times.items(), key=lambda kv: -kv[1])

    # steady-state pass: min-of-2 warm reps for the cold top-N — the
    # queries whose cross-decade ratios carry the scale claims
    warm: dict[str, float] = {}
    for name, _cold in ranked[:WARM_TOP_N]:
        ctl.gap()
        best = None
        try:
            for _ in range(2):
                t = time.time()
                reg[name].run(spark, SF_DIR).count()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            warm[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            errors[f"warm:{name}"] = str(e)[:150]
        print(f"warm {name} {warm.get(name, 'ERR')}", file=sys.stderr)
    ctl.gap()

    top30 = dict(ranked[:30])
    out = {
        "metric": "query_profile",
        "sf_dir": SF_DIR,
        "shard": shard,
        "n": len(times),
        "total_sec": round(sum(times.values()), 1),
        "elapsed_sec": round(time.time() - t0, 1),
        "times": times,
        "times_norm": {name: round(t / ctl.local_vs_ref(gidx[name]), 3)
                       for name, t in times.items()},
        "top30": top30,
        "top30_norm": {name: round(times[name] / ctl.local_vs_ref(
            gidx[name]), 3) for name in top30},
        "topN_warm": warm,
        "warm_top_n": WARM_TOP_N,
        "p50": ranked[len(ranked) // 2][1] if ranked else None,
        "errors": errors,
        "control": ctl.stamp(),
    }
    print(json.dumps(out))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)


if __name__ == "__main__":
    main()
