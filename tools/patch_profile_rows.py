"""Patch named rows of a merged query-profile artifact with a
targeted re-profile run (r10 verdict task 3 — error-row retirement
and post-fix re-timing).

    python tools/patch_profile_rows.py OUT.json BASE.json PATCH.json \
        [--note "free-text provenance"]

BASE is a merged profile artifact (merge_profile_shards.py shape);
PATCH is a profile_queries.py artifact produced with SWEEP_ONLY (a
targeted single-process run). Every query timed in PATCH replaces or
adds the corresponding BASE row in ``times`` / ``times_norm`` /
``topN_warm``; cold and warm error rows for those names are dropped
as resolved. Derived fields (n / total_sec / top30 / top30_norm /
p50) are recomputed. The artifact records exactly what was patched
and with what session shape, so a reader can tell which rows were
measured under shard contention and which single-process.

Unlike union_profile_parts.py (which asserts NO overlap — crash
salvage), overlap here is the point: pre-fix rows get REPLACED.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    argv = list(sys.argv[1:])
    note = ""
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        del argv[i:i + 2]
    out_path, base_path, patch_path = argv[:3]
    art = json.load(open(base_path))
    patch = json.load(open(patch_path))
    assert patch.get("sf_dir") == art.get("sf_dir"), (
        f"sf mismatch: base {art.get('sf_dir')} vs patch "
        f"{patch.get('sf_dir')}")
    patched = sorted(patch["times"])
    assert patched, "patch artifact timed no queries"
    replaced = [n for n in patched if n in art["times"]]
    resolved_errors = []
    for n in patched:
        art["times"][n] = patch["times"][n]
        # drop the BASE row's derived entries first (r12 advice guard):
        # if the patch timed a query but lacks its times_norm/topN_warm
        # entry, a surviving pre-fix value would sit beside the
        # replaced raw timing and feed the recomputed top30_norm —
        # mixing pre- and post-fix measurements in one row
        art.get("times_norm", {}).pop(n, None)
        art.get("topN_warm", {}).pop(n, None)
        if n in patch.get("times_norm", {}):
            art.setdefault("times_norm", {})[n] = patch["times_norm"][n]
        if n in patch.get("topN_warm", {}):
            art.setdefault("topN_warm", {})[n] = patch["topN_warm"][n]
        for ekey in (n, f"warm:{n}"):
            if ekey in art.get("errors", {}):
                del art["errors"][ekey]
                resolved_errors.append(ekey)
    # patch-run errors still stand (a re-run that ALSO failed must not
    # silently vanish) — carry them forward tagged with the patch shape
    for ekey, msg in patch.get("errors", {}).items():
        art.setdefault("errors", {})[ekey] = f"[patch re-run] {msg}"
    art["n"] = len(art["times"])
    art["total_sec"] = round(sum(art["times"].values()), 1)
    art["elapsed_cpu_sec"] = round(
        art.get("elapsed_cpu_sec", art.get("elapsed_sec", 0.0))
        + patch.get("elapsed_sec", 0.0), 1)
    ranked = sorted(art["times"].items(), key=lambda kv: -kv[1])
    art["top30"] = dict(ranked[:30])
    art["top30_norm"] = {n: art["times_norm"][n] for n, _ in ranked[:30]
                         if n in art.get("times_norm", {})}
    art["p50"] = ranked[len(ranked) // 2][1] if ranked else None
    rec = {
        "names": patched,
        "replaced": replaced,
        "added": [n for n in patched if n not in replaced],
        "resolved_errors": sorted(resolved_errors),
        "patch_control": patch.get("control"),
        "note": note,
    }
    # repeated patches append — each pass keeps its own provenance
    prior = art.get("patched_rows")
    if prior is None:
        art["patched_rows"] = rec
    elif isinstance(prior, list):
        art["patched_rows"] = prior + [rec]
    else:
        art["patched_rows"] = [prior, rec]
    with open(out_path, "w") as fh:
        json.dump(art, fh)
    print(json.dumps({"n": art["n"], "patched": len(patched),
                      "replaced": len(replaced),
                      "resolved_errors": sorted(resolved_errors),
                      "errors_left": sorted(art.get("errors", {}))}))


if __name__ == "__main__":
    main()
