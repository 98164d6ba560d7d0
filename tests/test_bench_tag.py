"""Pin the bench artifact round-tag rule (r12 verdict item 2).

History of the bug class: the r11 max+1 rule labeled the driver's
bench one round ahead; the r12 existence-check rule then labeled the
driver's SECOND same-round run (the 8-core scaling rep) one round
ahead again (it landed as BENCH_r13_full.json during round 12). The
rule under test: the tag is ALWAYS the highest CORRECTNESS round, and
same-round filename collisions resolve by a _c{cpus} suffix — two
consecutive runs in one round must never emit two different round
tags.
"""

from __future__ import annotations

import os

import bench


def _touch(d, name):
    with open(os.path.join(d, name), "w") as fh:
        fh.write("{}")


def test_tag_is_max_correctness_round(tmp_path):
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r11.json")
    _touch(d, "CORRECTNESS_r12.json")
    assert bench._round_tag(d) == "r12"


def test_tag_empty_dir_is_r01(tmp_path):
    assert bench._round_tag(str(tmp_path)) == "r01"


def test_tag_never_bumps_past_correctness_round(tmp_path):
    # The r12 failure mode: the full bench for the current round
    # already exists (first run of the round), and the second run
    # (different core count) must STILL tag the same round.
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r12.json")
    _touch(d, "BENCH_r12_full.json")
    assert bench._round_tag(d) == "r12"


def test_two_consecutive_runs_one_round_same_tag_distinct_files(tmp_path):
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r13.json")
    first = bench._default_full_name(d, "r13", "32")
    assert os.path.basename(first) == "BENCH_r13_full.json"
    _touch(d, os.path.basename(first))
    # second run, low-core scaling rep: same round tag, cpu-suffixed
    # name, no overwrite of the first artifact
    assert bench._round_tag(d) == "r13"
    second = bench._default_full_name(d, "r13", "8")
    assert os.path.basename(second) == "BENCH_r13_c8_full.json"
    assert second != first


def test_third_collision_appends_counter(tmp_path):
    d = str(tmp_path)
    _touch(d, "BENCH_r13_full.json")
    _touch(d, "BENCH_r13_c8_full.json")
    third = bench._default_full_name(d, "r13", "8")
    assert os.path.basename(third) == "BENCH_r13_c8_2_full.json"
