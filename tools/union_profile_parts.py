"""Union a crashed profile shard's salvaged log timings with its
resume-run artifact (SWEEP_SKIP) into one shard artifact.

    python tools/union_profile_parts.py OUT.json RESUME.json SALVAGE.txt \
        ELAPSED_A

SALVAGE.txt holds "name seconds" lines parsed from the crashed
attempt's stderr log — real measurements from the same sf/config; they
lack gap-normalized entries (the crashed attempt's control brackets
died with it), so they appear in ``times`` but not ``times_norm``,
and the artifact records which names were salvaged. ELAPSED_A is the
crashed attempt's wall seconds (for elapsed_cpu accounting).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, resume_path, salvage_path, elapsed_a = sys.argv[1:5]
    art = json.load(open(resume_path))
    salvaged: dict[str, float] = {}
    with open(salvage_path) as fh:
        for ln in fh:
            parts = ln.split()
            if len(parts) >= 2:
                salvaged[parts[0]] = float(parts[1])
    overlap = set(salvaged) & set(art["times"])
    assert not overlap, f"salvage overlaps resume run: {sorted(overlap)[:5]}"
    art["times"].update(salvaged)
    art["n"] = len(art["times"])
    art["total_sec"] = round(sum(art["times"].values()), 1)
    art["elapsed_sec"] = round(art["elapsed_sec"] + float(elapsed_a), 1)
    art["salvaged_from_crashed_attempt"] = sorted(salvaged)
    ranked = sorted(art["times"].items(), key=lambda kv: -kv[1])
    art["top30"] = dict(ranked[:30])
    art["top30_norm"] = {n: art["times_norm"][n] for n, _ in ranked[:30]
                         if n in art.get("times_norm", {})}
    art["p50"] = ranked[len(ranked) // 2][1] if ranked else None
    with open(out_path, "w") as fh:
        json.dump(art, fh)
    print(json.dumps({"n": art["n"], "salvaged": len(salvaged),
                      "resumed": art["n"] - len(salvaged)}))


if __name__ == "__main__":
    main()
