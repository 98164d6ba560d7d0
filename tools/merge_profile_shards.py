"""Merge profile_queries.py shard artifacts into one profile artifact.

    python tools/merge_profile_shards.py OUT.json shard0.json ... \
        [--quiet PRE.json [POST.json]]

Same completeness validation and control posture as
merge_sweep_shards.py: the shard labels must form exactly {0..k-1}/k,
and in-shard GapControl stamps are kept per-shard only (k concurrent
shards contend — they measure contention, not the VM); the quiet-box
session-speed reference comes from ``--quiet`` (tools/quiet_control.py
stamps taken on the idle box before launch / after join).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    argv = list(sys.argv[1:])
    quiet_paths: list[str] = []
    if "--quiet" in argv:
        i = argv.index("--quiet")
        quiet_paths = argv[i + 1:]
        argv = argv[:i]
    # --quiet is greedy (everything after it) — reject a shard file
    # accidentally placed there instead of silently dropping it from
    # the merge (r10 advice): quiet stamps are control_stats records
    # and must carry 'vs_ref'; shard files never do.
    for p in quiet_paths:
        rec = json.load(open(p))
        assert "vs_ref" in rec and "shard" not in rec, (
            f"--quiet file {p} does not look like a quiet_control.py "
            "control stamp (want a control_stats record with 'vs_ref'; "
            "did a shard path land after --quiet?)")
    out_path, shard_paths = argv[0], argv[1:]
    shards = [json.load(open(p)) for p in shard_paths]
    assert shards, "no shard files given"
    sf_dirs = {s["sf_dir"] for s in shards}
    assert len(sf_dirs) == 1, f"mixed sf_dirs: {sf_dirs}"
    labels = [s.get("shard") for s in shards]
    assert all(labels), f"shard file missing its 'shard' label: {labels}"
    ks = {lab.split("/")[1] for lab in labels}
    assert len(ks) == 1, f"inconsistent shard counts k: {ks}"
    k = int(next(iter(ks)))
    seen = [int(lab.split("/")[0]) for lab in labels]
    assert sorted(seen) == list(range(k)), (
        f"shards are not a complete disjoint partition: got {sorted(seen)}, "
        f"want 0..{k - 1} (duplicate or missing shard file?)")
    times: dict = {}
    times_norm: dict = {}
    warm: dict = {}
    errors: dict = {}
    for s in shards:
        times.update(s.get("times", {}))
        times_norm.update(s.get("times_norm", {}))
        warm.update(s.get("topN_warm", {}))
        errors.update(s.get("errors", {}))
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    quiet = [json.load(open(p)) for p in quiet_paths]
    merged = {
        "metric": "query_profile",
        "sf_dir": shards[0]["sf_dir"],
        "shards": labels,
        "n": len(times),
        "total_sec": round(sum(times.values()), 1),
        "elapsed_sec": round(max(s["elapsed_sec"] for s in shards), 1),
        "elapsed_cpu_sec": round(sum(s["elapsed_sec"] for s in shards), 1),
        "times": times,
        "times_norm": times_norm,
        "top30": dict(ranked[:30]),
        "top30_norm": {n: times_norm[n] for n, _ in ranked[:30]
                       if n in times_norm},
        "topN_warm": warm,
        "p50": ranked[len(ranked) // 2][1] if ranked else None,
        "errors": errors,
        "control": {
            "note": ("per-shard stamps are CONTENDED (k concurrent "
                     "shards); the quiet-box session-speed reference "
                     "is 'quiet' (measured on the idle box before "
                     "launch / after join)"),
            "quiet": quiet or None,
            "shards": [s.get("control") for s in shards],
        },
    }
    with open(out_path, "w") as fh:
        json.dump(merged, fh)
    print(json.dumps({"n": merged["n"], "total_sec": merged["total_sec"],
                      "elapsed_sec": merged["elapsed_sec"],
                      "n_errors": len(errors),
                      "quiet_vs_ref": [q.get("vs_ref") for q in quiet]}))


if __name__ == "__main__":
    main()
