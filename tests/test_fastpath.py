"""DSL fast path (dsl/fastpath.py): L4 multigrid legs routed through the
Pallas whole-leg kernels must reproduce the plain staged-XLA path's
residual sequence, and the dead-store elision of the residual field must
be gated by the liveness proof (dsl/liveness.py).

Runs on CPU in Pallas interpret mode via EXA_FASTPATH_FORCE (the same
kernels execute un-interpreted on TPU; parity of the kernels themselves
is covered by tests/test_pallas_kernels.py)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier only (ci.sh quick gate skips)

from exastencils_tpu.config import Knowledge
from exastencils_tpu.dsl.interpreter import L4Executable
from exastencils_tpu.dsl.parser import parse_l4

BENCH = os.path.join(os.path.dirname(__file__), os.pardir,
                     "examples", "poisson_3d_bench.exa4")


def _knowledge(fastpath: bool) -> Knowledge:
    return Knowledge(
        dimensionality=3,
        minLevel=1,
        maxLevel=4,
        useDblPrecision=True,
        tpu_shard_dsl=False,
        tpu_dsl_fastpath=fastpath,
    ).update()


def _run(fastpath: bool):
    prog = parse_l4(BENCH)
    lines = []
    ex = L4Executable(prog, _knowledge(fastpath), out=lines.append)
    ex.run("Application")
    return ex, lines


def _fused_segments(ex):
    if ex._fastpath is None:
        return []
    segs = []
    for v in ex._fastpath._plans.values():
        if isinstance(v, tuple) and len(v) == 2 and isinstance(v[1], list):
            segs.extend(v[1])
    return segs


@pytest.fixture()
def force_fastpath(monkeypatch):
    monkeypatch.setenv("EXA_FASTPATH_FORCE", "1")


def test_fastpath_matches_plain_residuals(force_fastpath):
    ex_fast, fast = _run(fastpath=True)
    segs = _fused_segments(ex_fast)
    assert segs, "fast path produced no fused segments on the bench program"
    # whole-leg fusion (span > 1 statement) must fire, not just the
    # standalone smoother match
    assert any(s.end > s.start for s in segs), "no whole-leg fusion"

    _, plain = _run(fastpath=False)
    assert len(fast) == len(plain)
    for lf, lp in zip(fast, plain):
        vf, vp = float(lf), float(lp)
        assert vf == pytest.approx(vp, rel=1e-5, abs=1e-12), (lf, lp)


def test_fastpath_off_by_default_on_cpu(monkeypatch):
    monkeypatch.delenv("EXA_FASTPATH_FORCE", raising=False)
    prog = parse_l4(BENCH)
    ex = L4Executable(prog, _knowledge(True), out=lambda s: None)
    assert ex._fastpath is None  # CPU without the force flag: plain path


def test_liveness_blocks_elision_when_residual_read(force_fastpath):
    """A Solve that reads Res@finest right after MGCycle (no CalcRes
    overwrite first) must NOT get the finest down-leg elision — but the
    coarser levels, whose residuals stay dead, still fuse."""
    src = open(BENCH).read().replace(
        """		MGCycle@finest ( )
		CalcRes@finest ( )
		r = ResNorm@finest ( )""",
        """		MGCycle@finest ( )
		r = ResNorm@finest ( )""",
    )
    assert src.count("CalcRes@finest ( )") == 1  # only the pre-loop one left
    prog = parse_l4(src)
    lines = []
    ex = L4Executable(prog, _knowledge(True), out=lines.append)
    ex.run("Application")
    finest = ex.k.maxLevel
    body = ex.functions[("MGCycle", finest)].body
    plan_finest = ex._fastpath.plan(body, finest)
    # down-leg spans >= 3 statements; at the finest level the read of
    # Res via ResNorm (without a preceding kill) must block it
    assert not any(s.end - s.start >= 2 and s.start == 0 for s in plan_finest)
    plan_below = ex._fastpath.plan(body, finest - 1)
    assert any(s.end - s.start >= 2 for s in plan_below), \
        "down-leg should still fuse below the finest level"


def test_stale_residual_rematerializes_on_read(force_fastpath):
    """After a fused cycle the elided residual must rematerialize as the
    residual of the current iterate when read through get_field."""
    prog = parse_l4(BENCH)
    ex = L4Executable(prog, _knowledge(True), out=lambda s: None)
    finest = ex.k.maxLevel
    ex.call_function(ex.functions[("InitF", finest)], finest, [])
    ex.call_function(ex.functions[("MGCycle", finest)], finest, [])
    stale_keys = set(ex._stale)
    assert ("Res", finest) in stale_keys, "residual store was not elided"
    res = np.asarray(ex.get_field("Res", finest))
    assert ("Res", finest) not in ex._stale
    # compare against an explicit CalcRes of the same iterate
    ex2 = L4Executable(parse_l4(BENCH), _knowledge(False), out=lambda s: None)
    u = ex.get_field("U", finest)
    f = ex.get_field("F", finest)
    ex2.state[("U", finest)] = u
    ex2.state[("F", finest)] = f
    ex2.call_function(ex2.functions[("CalcRes", finest)], finest, [])
    want = np.asarray(ex2.get_field("Res", finest))
    np.testing.assert_allclose(res, want, rtol=1e-12, atol=1e-12)
