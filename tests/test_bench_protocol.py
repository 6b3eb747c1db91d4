"""The driver-run bench protocol must not bitrot: run bench.py end-to-end
in a subprocess on CPU (BENCH_CPU=1) at a tiny resolution and validate the
JSON contract the driver parses."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(env_extra):
    env = dict(
        os.environ,
        BENCH_CPU="1",
        BENCH_SESSIONS="1",
        BENCH_REPEATS="1",
        BENCH_WIDTH="32",
        BENCH_HEIGHT="24",
        BENCH_TILE="768",
        BENCH_PALLAS="0",
    )
    env.update(env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert set(out) == {"metric", "value", "unit", "vs_baseline"}, out
    assert out["unit"] == "ms" and out["value"] > 0
    return out, p.stderr


def test_bench_json_contract_realistic():
    out, err = _run({})
    assert "realistic" in out["metric"]
    assert '"compile_s"' in err  # compile telemetry for the driver tail


def test_bench_overlapped_groups_path():
    # the 1080p default takes the overlapped-fetch branch (16 tiles in 8
    # groups of 2 since the 131072-tile default); exercise that branch
    # shape-for-shape at tiny scale: 8 tiles of 384 rays in 4 groups of 2
    out, _ = _run(
        {
            "BENCH_WIDTH": "64",
            "BENCH_HEIGHT": "48",
            "BENCH_TILE": "384",
            "BENCH_OVERLAP": "4",
            "BENCH_U32": "1",
        }
    )
    assert "realistic" in out["metric"]


def test_bench_multi_session_picks_best():
    env = dict(
        os.environ,
        BENCH_CPU="1",
        BENCH_SESSIONS="2",
        BENCH_REPEATS="1",
        BENCH_WIDTH="32",
        BENCH_HEIGHT="24",
        BENCH_TILE="768",
        BENCH_PALLAS="0",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env, capture_output=True, text=True, timeout=540,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert "session bests" in p.stderr
    assert out["value"] > 0
