"""Merge oracle_sweep_full.py shard artifacts into one sweep artifact.

The full-registry paired sweep at sf10 is ~6 h single-process (r8 data
point: 150 queries / 5,099 s); k concurrent shard processes (each its
own Spark JVM + DuckDB, SWEEP_SHARD=i/k) bring it inside a round.
This merges their JSONs:

    python tools/merge_sweep_shards.py OUT.json shard0.json shard1.json ...

- ``paired`` / ``rows_only`` / ``failures``: summed / unioned.
- ``elapsed_sec``: max over shards (wall clock of the concurrent run);
  ``elapsed_cpu_sec``: sum (the single-process-equivalent cost).
- ``control``: per-shard stamps kept under ``shards`` plus a pooled
  stamp over every shard's gap medians — concurrency means shards
  contend with each other, so the pooled vs_ref reads HIGH relative
  to a quiet box; the honest interpretation note is embedded.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, shard_paths = sys.argv[1], sys.argv[2:]
    shards = [json.load(open(p)) for p in shard_paths]
    assert shards, "no shard files given"
    sf_dirs = {s["sf_dir"] for s in shards}
    assert len(sf_dirs) == 1, f"mixed sf_dirs: {sf_dirs}"
    failures: dict = {}
    for s in shards:
        failures.update(s.get("failures", {}))
    medians = [s["control"]["median"] for s in shards
               if s.get("control", {}).get("median")]
    merged = {
        "metric": "oracle_sweep_full",
        "sf_dir": shards[0]["sf_dir"],
        "sample_n": None,
        "seed": None,
        "shards": [s.get("shard") for s in shards],
        "paired": sum(s["paired"] for s in shards),
        "rows_only": sum(s["rows_only"] for s in shards),
        "failures": failures,
        "elapsed_sec": round(max(s["elapsed_sec"] for s in shards), 1),
        "elapsed_cpu_sec": round(sum(s["elapsed_sec"] for s in shards), 1),
        "control": {
            "note": ("pooled over concurrent shards: shards contend "
                     "with each other, so vs_ref reads high relative "
                     "to a quiet-box run; per-shard stamps below"),
            "median_of_shard_medians": (round(statistics.median(medians), 4)
                                        if medians else None),
            "shards": [s.get("control") for s in shards],
        },
    }
    with open(out_path, "w") as fh:
        json.dump(merged, fh)
    print(json.dumps({k: merged[k] for k in
                      ("paired", "rows_only", "elapsed_sec",
                       "elapsed_cpu_sec")} | {
                          "n_failures": len(failures)}))


if __name__ == "__main__":
    main()
