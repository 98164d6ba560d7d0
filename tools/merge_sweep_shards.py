"""Merge oracle_sweep_full.py shard artifacts into one sweep artifact.

The full-registry paired sweep at sf10 is ~6 h single-process (r8 data
point: 150 queries / 5,099 s); k concurrent shard processes (each its
own Spark JVM + DuckDB, SWEEP_SHARD=i/k) bring it inside a round.
This merges their JSONs:

    python tools/merge_sweep_shards.py OUT.json shard0.json ... \
        [--quiet PRE.json [POST.json]]

- ``paired`` / ``rows_only`` / ``failures``: summed / unioned.
- ``elapsed_sec``: max over shards (wall clock of the concurrent run);
  ``elapsed_cpu_sec``: sum (the single-process-equivalent cost).
- Shard completeness is VALIDATED (r9 advice): every shard must carry
  a ``shard`` label "i/k", all with one consistent k, and the i's must
  be exactly {0..k-1} with no duplicates — passing the same shard file
  twice or omitting one is an error, not a silently wrong artifact.
- ``control``: per-shard stamps ONLY (r9 verdict task 5 — shards
  contend with each other, so an in-shard control measures contention,
  not the VM; the old pooled median is dropped). The quiet-box
  session-speed reference comes from ``--quiet``: control stamps
  measured by tools/quiet_control.py on the idle box immediately
  before shard launch and after shard join.
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
    # --quiet is greedy — validate each file IS a control stamp so a
    # misplaced shard path fails loudly instead of vanishing from the
    # merge (r10 advice; same guard as merge_profile_shards.py).
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
    # completeness: labels must be exactly {0..k-1}/k, disjoint
    labels = [s.get("shard") for s in shards]
    assert all(labels), f"shard file missing its 'shard' label: {labels}"
    ks = {lab.split("/")[1] for lab in labels}
    assert len(ks) == 1, f"inconsistent shard counts k: {ks}"
    k = int(next(iter(ks)))
    seen = [int(lab.split("/")[0]) for lab in labels]
    assert sorted(seen) == list(range(k)), (
        f"shards are not a complete disjoint partition: got {sorted(seen)}, "
        f"want 0..{k - 1} (duplicate or missing shard file?)")
    failures: dict = {}
    dispositioned: dict = {}
    for s in shards:
        failures.update(s.get("failures", {}))
        dispositioned.update(s.get("dispositioned") or {})
    quiet = [json.load(open(p)) for p in quiet_paths]
    merged = {
        "metric": "oracle_sweep_full",
        "sf_dir": shards[0]["sf_dir"],
        "sample_n": shards[0].get("sample_n"),
        "seed": shards[0].get("seed"),
        "shards": labels,
        "paired": sum(s["paired"] for s in shards),
        "rows_only": sum(s["rows_only"] for s in shards),
        "failures": failures,
        "dispositioned": dispositioned or None,
        "elapsed_sec": round(max(s["elapsed_sec"] for s in shards), 1),
        "elapsed_cpu_sec": round(sum(s["elapsed_sec"] for s in shards), 1),
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
    print(json.dumps({key: merged[key] for key in
                      ("paired", "rows_only", "elapsed_sec",
                       "elapsed_cpu_sec")} | {
                          "n_failures": len(failures),
                          "quiet_vs_ref": [q.get("vs_ref") for q in quiet]}))


if __name__ == "__main__":
    main()
