"""Exercise the full bench.py path on CPU (BENCH_SMOKE=1) every round.

Round 4's official bench artifact was lost to a cold-compile timeout that a
pre-driver smoke run would have caught — except BENCH_SMOKE claimed to be
CPU-feasible while still dialing the TPU. This test runs the real bench
script as a subprocess in smoke mode (which now forces the CPU platform) and
asserts the contract the driver depends on: exit 0 and a parseable final
stdout line carrying the self-contained headline schema, plus at least one
earlier provisional line so a mid-run kill can never erase the evidence.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.slow


def test_bench_smoke_emits_parseable_headline():
    env = dict(os.environ)
    env.update({"BENCH_SMOKE": "1", "BENCH_BUDGET_S": "600"})
    # the conftest pins tests to CPU; the bench subprocess must do it alone
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2, "expected provisional + final headline lines"
    headline = json.loads(lines[-1])
    assert headline["value"] is not None and headline["value"] > 0
    assert headline["unit"] == "images/sec/chip"
    assert "vs_baseline" in headline
    assert "families" in headline
    assert not headline.get("partial"), "final line must not be provisional"
    # every earlier JSON line must be independently parseable (last-line-wins)
    provisional = [json.loads(ln) for ln in lines[:-1]]
    assert any(p.get("partial") for p in provisional)
    # smoke mode must not have touched the TPU: the CPU platform is forced
    full_record = json.loads(lines[-2])
    assert "TPU" not in full_record["device"], full_record["device"]
