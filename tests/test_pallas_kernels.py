"""Parity tests: Pallas streaming kernels vs the jnp reference ops.

The jnp implementations (ops/smoothers.py, ops/stencil_apply.py) are the
always-correct reference path (the analog of the reference's host code
next to CUDA kernels, parallelization/api/cuda/); every Pallas kernel
must match them bit-for-bit in structure (same update formula and
Gauss-Seidel ordering), so tolerances here are tight.  Kernels run in
interpreter mode on the CPU test backend (the reference tests CUDA
codegen on CPU hosts the same way, Testing/CUDA/*)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exastencils_tpu.core.stencil import BoundStencil
from exastencils_tpu.ops.pallas.stream3d import (
    pallas_applicable_3d,
    rbgs_fused_3d,
)
from exastencils_tpu.ops.smoothers import color_mask, jacobi_update


def star3d(h=0.1):
    offsets = [(0, 0, 0)]
    coefs = [6.0 / h**2]
    for d in range(3):
        for s in (-1, 1):
            off = [0, 0, 0]
            off[d] = s
            offsets.append(tuple(off))
            coefs.append(-1.0 / h**2)
    return BoundStencil("L", tuple(offsets), tuple(coefs))


def boundary_mask(shape):
    m = np.zeros(shape, bool)
    for d in range(len(shape)):
        sl = [slice(None)] * len(shape)
        sl[d] = 0
        m[tuple(sl)] = True
        sl[d] = -1
        m[tuple(sl)] = True
    return m


def rbgs_reference(sol, rhs, A, omega, n_iters):
    """n_iters of masked-Jacobi half sweeps with boundary restore — the
    exact jnp path of make_smoother on the dense backend."""
    bmask = jnp.asarray(boundary_mask(sol.shape))
    bvals = sol
    for _ in range(n_iters):
        for color in (0, 1):
            mask = color_mask(sol.shape, color)
            sol = jacobi_update(sol, rhs, A, omega, mask)
            sol = jnp.where(bmask, bvals, sol)
    return sol


@pytest.mark.parametrize("shape", [(9, 9, 9), (17, 12, 21), (8, 9, 16)])
@pytest.mark.parametrize("n_iters", [1, 2, 3])
def test_rbgs_fused_matches_jnp(shape, n_iters):
    rng = np.random.default_rng(42)
    sol = jnp.asarray(rng.standard_normal(shape))
    rhs = jnp.asarray(rng.standard_normal(shape))
    A = star3d()
    assert pallas_applicable_3d(shape, A.offsets, A.coefs)

    want = rbgs_reference(sol, rhs, A, 0.8, n_iters)
    got = rbgs_fused_3d(sol, rhs, A.offsets, A.coefs, 0.8, n_iters, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)


def test_boundary_preserved():
    rng = np.random.default_rng(0)
    shape = (9, 9, 9)
    sol = jnp.asarray(rng.standard_normal(shape))
    rhs = jnp.asarray(rng.standard_normal(shape))
    A = star3d()
    got = rbgs_fused_3d(sol, rhs, A.offsets, A.coefs, 0.8, 2, interpret=True)
    bmask = boundary_mask(shape)
    np.testing.assert_array_equal(np.asarray(got)[bmask], np.asarray(sol)[bmask])


def test_rejects_non_star():
    offsets = ((0, 0, 0), (1, 1, 0))
    coefs = (4.0, -1.0)
    assert not pallas_applicable_3d((9, 9, 9), offsets, coefs)


# ----------------------------------------------------------------------
# fused cycle legs: residual+restriction (down) / prolongation+correction
# (up) vs the unfused jnp composition
# ----------------------------------------------------------------------

from exastencils_tpu.core.stencil import node_prolongation, node_restriction
from exastencils_tpu.ops.pallas.stream3d import (
    prolong_correct_fused_3d,
    res_restrict_fused_3d,
)
from exastencils_tpu.ops.stencil_apply import apply_stencil
from exastencils_tpu.ops.transfer import (
    apply_separable,
    build_prolong_mats,
    build_restrict_mats,
    separable_kernels,
)


def inner_mask(shape):
    return ~boundary_mask(shape)


@pytest.mark.parametrize("level", [3, 4])
def test_res_restrict_fused_matches_jnp(level):
    rng = np.random.default_rng(7)
    n = 2 ** level + 1
    fine = (n, n, n)
    coarse = ((n - 1) // 2 + 1,) * 3
    sol = jnp.asarray(rng.standard_normal(fine))
    rhs = jnp.asarray(rng.standard_normal(fine))
    A = star3d()
    R = node_restriction(3)
    r_mats = [jnp.asarray(m) for m in build_restrict_mats(R, coarse, fine, coarse)]
    wz = separable_kernels(R)[0]

    residual = jnp.where(jnp.asarray(inner_mask(fine)),
                         rhs - apply_stencil(A, sol), 0.0)
    want = apply_separable(r_mats, residual)
    got = res_restrict_fused_3d(sol, rhs, A.offsets, A.coefs,
                                r_mats[1], r_mats[2], wz, R.lo[0], coarse,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("level", [3, 4])
def test_prolong_correct_fused_matches_jnp(level):
    rng = np.random.default_rng(11)
    n = 2 ** level + 1
    fine = (n, n, n)
    coarse = ((n - 1) // 2 + 1,) * 3
    sol = jnp.asarray(rng.standard_normal(fine))
    sol_c = jnp.asarray(rng.standard_normal(coarse))
    Pop = node_prolongation(3)
    p_mats = [jnp.asarray(m) for m in build_prolong_mats(Pop, fine, coarse, fine)]
    wz = separable_kernels(Pop)[0]

    corr = apply_separable(p_mats, sol_c)
    want = jnp.where(jnp.asarray(inner_mask(fine)), sol + corr, sol)
    got = prolong_correct_fused_3d(sol, sol_c, p_mats[1], p_mats[2],
                                   wz, Pop.lo[0], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


# ----------------------------------------------------------------------
# whole-leg fusion: pre-smooth+residual+restrict / prolong+correct+
# post-smooth vs the step-by-step jnp composition
# ----------------------------------------------------------------------

from exastencils_tpu.ops.pallas.stream3d import (
    prolong_correct_smooth_fused_3d,
    smooth_res_restrict_fused_3d,
)


@pytest.mark.parametrize("level,K", [(3, 1), (3, 3), (4, 2)])
def test_smooth_down_leg_matches_jnp(level, K):
    rng = np.random.default_rng(5)
    n = 2 ** level + 1
    fine = (n, n, n)
    coarse = ((n - 1) // 2 + 1,) * 3
    sol = jnp.asarray(rng.standard_normal(fine))
    rhs = jnp.asarray(rng.standard_normal(fine))
    A = star3d()
    R = node_restriction(3)
    r_mats = [jnp.asarray(m) for m in build_restrict_mats(R, coarse, fine, coarse)]
    wz = separable_kernels(R)[0]

    s_want = rbgs_reference(sol, rhs, A, 0.8, K)
    residual = jnp.where(jnp.asarray(inner_mask(fine)),
                         rhs - apply_stencil(A, s_want), 0.0)
    rc_want = apply_separable(r_mats, residual)

    s_got, rc_got = smooth_res_restrict_fused_3d(
        sol, rhs, A.offsets, A.coefs, 0.8, K, r_mats[1], r_mats[2],
        wz, R.lo[0], coarse, interpret=True)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rc_got), np.asarray(rc_want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("level,K", [(3, 1), (3, 3), (4, 2)])
def test_up_smooth_leg_matches_jnp(level, K):
    rng = np.random.default_rng(9)
    n = 2 ** level + 1
    fine = (n, n, n)
    coarse = ((n - 1) // 2 + 1,) * 3
    sol = jnp.asarray(rng.standard_normal(fine))
    sol_c = jnp.asarray(rng.standard_normal(coarse))
    rhs = jnp.asarray(rng.standard_normal(fine))
    A = star3d()
    Pop = node_prolongation(3)
    p_mats = [jnp.asarray(m) for m in build_prolong_mats(Pop, fine, coarse, fine)]
    wz = separable_kernels(Pop)[0]

    corr = apply_separable(p_mats, sol_c)
    s_want = jnp.where(jnp.asarray(inner_mask(fine)), sol + corr, sol)
    s_want = rbgs_reference(s_want, rhs, A, 0.8, K)

    s_got = prolong_correct_smooth_fused_3d(
        sol, sol_c, rhs, A.offsets, A.coefs, 0.8, K, p_mats[1], p_mats[2],
        wz, Pop.lo[0], interpret=True)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_want),
                               rtol=1e-12, atol=1e-12)
