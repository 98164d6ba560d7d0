"""Shard-merge completeness validation (r9 advice): the merge tools
must refuse inputs that are not a complete, disjoint {0..k-1}/k shard
partition — a duplicated or omitted shard file silently inflates or
deflates the artifact's paired counts otherwise.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sweep_shard(i, k, paired=10):
    return {"metric": "oracle_sweep_full", "sf_dir": "/x",
            "sample_n": None, "seed": None, "shard": f"{i}/{k}",
            "paired": paired, "rows_only": 1, "failures": {},
            "elapsed_sec": 10.0 + i, "control": {"vs_ref": 1.0}}


def _profile_shard(i, k):
    return {"metric": "query_profile", "sf_dir": "/x", "shard": f"{i}/{k}",
            "n": 2, "total_sec": 3.0, "elapsed_sec": 5.0 + i,
            "times": {f"q{i}a": 1.0, f"q{i}b": 2.0},
            "times_norm": {f"q{i}a": 1.0, f"q{i}b": 2.0},
            "topN_warm": {}, "errors": {}, "control": {"vs_ref": 1.0}}


def _write(tmp_path, recs):
    paths = []
    for j, r in enumerate(recs):
        p = str(tmp_path / f"s{j}.json")
        with open(p, "w") as fh:
            json.dump(r, fh)
        paths.append(p)
    return paths


def _run(mod, tmp_path, recs, out="merged.json"):
    out_path = str(tmp_path / out)
    argv = ["merge", out_path] + _write(tmp_path, recs)
    old = sys.argv
    sys.argv = argv
    try:
        mod.main()
    finally:
        sys.argv = old
    return json.load(open(out_path))


@pytest.mark.parametrize("tool,mk", [
    ("merge_sweep_shards", _sweep_shard),
    ("merge_profile_shards", _profile_shard),
])
def test_complete_partition_merges(tmp_path, tool, mk):
    mod = _load(tool)
    merged = _run(mod, tmp_path, [mk(0, 3), mk(1, 3), mk(2, 3)])
    assert sorted(merged["shards"]) == ["0/3", "1/3", "2/3"]
    # wall = max, cpu = sum
    assert merged["elapsed_sec"] == 12.0 if tool == "merge_sweep_shards" \
        else merged["elapsed_sec"] == 7.0
    assert merged["elapsed_cpu_sec"] == sum(
        mk(i, 3)["elapsed_sec"] for i in range(3))
    # control: per-shard stamps only, no pooled median
    assert "median_of_shard_medians" not in merged["control"]
    assert len(merged["control"]["shards"]) == 3


@pytest.mark.parametrize("tool,mk", [
    ("merge_sweep_shards", _sweep_shard),
    ("merge_profile_shards", _profile_shard),
])
def test_duplicate_and_missing_shards_refused(tmp_path, tool, mk):
    mod = _load(tool)
    with pytest.raises(AssertionError, match="partition"):
        _run(mod, tmp_path, [mk(0, 3), mk(1, 3), mk(1, 3)], out="d.json")
    with pytest.raises(AssertionError, match="partition"):
        _run(mod, tmp_path, [mk(0, 3), mk(2, 3)], out="m.json")
    with pytest.raises(AssertionError, match="shard counts"):
        _run(mod, tmp_path, [mk(0, 2), mk(1, 3)], out="k.json")


def test_profile_merge_unions_times(tmp_path):
    mod = _load("merge_profile_shards")
    merged = _run(mod, tmp_path, [_profile_shard(0, 2),
                                  _profile_shard(1, 2)])
    assert set(merged["times"]) == {"q0a", "q0b", "q1a", "q1b"}
    assert merged["n"] == 4


def test_quiet_files_must_be_control_stamps(tmp_path):
    # r10 advice: --quiet is greedy; a shard path placed after it must
    # fail loudly instead of silently vanishing from the merge.
    mod = _load("merge_profile_shards")
    shard_paths = _write(tmp_path, [_profile_shard(0, 1)])
    ctl = str(tmp_path / "ctl.json")
    with open(ctl, "w") as fh:
        json.dump({"reps": [1.0], "median": 1.0, "cv": 0.0,
                   "ref_s": 1.0, "vs_ref": 1.0}, fh)
    out_path = str(tmp_path / "q.json")
    old = sys.argv
    try:
        # valid control stamp accepted
        sys.argv = ["merge", out_path] + shard_paths + ["--quiet", ctl]
        mod.main()
        merged = json.load(open(out_path))
        assert merged["n"] == 2
        # a shard artifact after --quiet is refused
        sys.argv = ["merge", out_path, shard_paths[0],
                    "--quiet", shard_paths[0]]
        with pytest.raises(AssertionError, match="quiet"):
            mod.main()
    finally:
        sys.argv = old


def test_patch_profile_rows_replaces_and_resolves(tmp_path):
    # r11: targeted re-profile rows replace pre-fix timings and retire
    # matching cold/warm error rows; derived fields recomputed.
    mod = _load("patch_profile_rows")
    base = {"metric": "query_profile", "sf_dir": "/x",
            "times": {"qa": 5.0, "qb": 801.0},
            "times_norm": {"qa": 4.9, "qb": 800.0},
            "topN_warm": {"qb": 916.0},
            "errors": {"qc": "boom", "warm:qd": "warmboom"},
            "n": 2, "total_sec": 806.0,
            "elapsed_sec": 100.0, "elapsed_cpu_sec": 400.0}
    patch = {"metric": "query_profile", "sf_dir": "/x",
             "times": {"qb": 100.0, "qc": 50.0, "qd": 7.0},
             "times_norm": {"qb": 99.0, "qc": 49.0, "qd": 7.1},
             "topN_warm": {"qb": 95.0, "qc": 48.0}, "errors": {},
             "elapsed_sec": 200.0, "control": {"vs_ref": 1.0}}
    bp, pp = str(tmp_path / "b.json"), str(tmp_path / "p.json")
    json.dump(base, open(bp, "w"))
    json.dump(patch, open(pp, "w"))
    out_path = str(tmp_path / "o.json")
    old = sys.argv
    sys.argv = ["patch", out_path, bp, pp, "--note", "single-process"]
    try:
        mod.main()
    finally:
        sys.argv = old
    o = json.load(open(out_path))
    assert o["times"] == {"qa": 5.0, "qb": 100.0, "qc": 50.0, "qd": 7.0}
    assert o["errors"] == {}
    assert o["topN_warm"]["qb"] == 95.0
    assert o["n"] == 4 and o["total_sec"] == 162.0
    assert o["patched_rows"]["resolved_errors"] == ["qc", "warm:qd"]
    assert o["patched_rows"]["replaced"] == ["qb"]
    # sf mismatch refused
    patch2 = dict(patch, sf_dir="/y")
    json.dump(patch2, open(pp, "w"))
    sys.argv = ["patch", out_path, bp, pp]
    try:
        with pytest.raises(AssertionError, match="sf mismatch"):
            mod.main()
    finally:
        sys.argv = old


def test_patch_profile_rows_drops_stale_derived_entries(tmp_path):
    # r12 advice guard: a patch that re-times a query but carries no
    # times_norm/topN_warm entry for it must DROP the base's pre-fix
    # derived values, not let them survive beside the replaced raw
    # timing (they'd feed the recomputed top30_norm with a pre-fix
    # measurement).
    mod = _load("patch_profile_rows")
    base = {"metric": "query_profile", "sf_dir": "/x",
            "times": {"qa": 5.0, "qb": 801.0},
            "times_norm": {"qa": 4.9, "qb": 800.0},
            "topN_warm": {"qb": 916.0},
            "errors": {}, "n": 2, "total_sec": 806.0,
            "elapsed_sec": 100.0, "elapsed_cpu_sec": 400.0}
    patch = {"metric": "query_profile", "sf_dir": "/x",
             "times": {"qb": 100.0},  # no times_norm / topN_warm
             "errors": {}, "elapsed_sec": 50.0}
    bp, pp = str(tmp_path / "b.json"), str(tmp_path / "p.json")
    json.dump(base, open(bp, "w"))
    json.dump(patch, open(pp, "w"))
    out_path = str(tmp_path / "o.json")
    old = sys.argv
    sys.argv = ["patch", out_path, bp, pp]
    try:
        mod.main()
    finally:
        sys.argv = old
    o = json.load(open(out_path))
    assert o["times"]["qb"] == 100.0
    assert "qb" not in o["times_norm"]
    assert "qb" not in o["topN_warm"]
    assert "qb" not in o["top30_norm"]
    assert o["times_norm"] == {"qa": 4.9}
