"""Benchmark-harness modes (reference Benchmark/run_benchmark.py +
ConfigRunner sweeps): the sweep driver and the reference-program bench
runners must produce well-formed one-line-JSON results on the CPU rig."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_ITERS"] = "2"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return [json.loads(l) for l in lines]


@pytest.mark.slow
def test_sweep_matrix():
    """ConfigRunner-lite: one JSON line per configuration, with the
    config echoed and the smoother axis actually reaching the solver."""
    rows = _run_bench(["--sweep", "level=5", "smoother=Jac,RBGS"])
    assert len(rows) == 2
    by_smoother = {r["config"]["smoother"]: r for r in rows}
    assert set(by_smoother) == {"Jac", "RBGS"}
    # different smoothers -> different convergence per cycle
    dj = by_smoother["Jac"]["detail"]["residual_drop_1cycle"]
    dr = by_smoother["RBGS"]["detail"]["residual_drop_1cycle"]
    assert dr < dj < 0.4
    for r in rows:
        assert r["unit"] == "GLUP/s" and r["value"] > 0


@pytest.mark.slow
def test_fivepoint_problem():
    """The FivePointStencil reference benchmark runs end to end from its
    unmodified inputs (reduced level on the CPU rig)."""
    rows = _run_bench(["--problem", "fivepoint", "--max-level", "7",
                       "--iters", "3"])
    assert len(rows) == 1
    r = rows[0]
    assert r["metric"] == "fivepoint_smoother_glups"
    assert r["value"] > 0
    assert r["detail"]["step_fn"] == "Smoother"
