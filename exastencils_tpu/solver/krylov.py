"""Krylov (coarse-grid) solvers.

Reference: the L3 coarse-grid-solver generators —
solver/l3/L3_ConjugateGradientForEquation.scala:33 (CG; its expanded L4
form is visible in mgCycle@coarsest of
Examples/Poisson/2D_FD_Poisson_fromL4.exa4 and is matched operation-for-
operation here, including reduction order and the early-exit placement),
L3_BiCGStabForEquation, L3_MinResForEquation,
L3_ConjugateResidualForEquation.

All solvers are `lax.while_loop`s over device-resident carries — the
TPU-native rendering of `repeat 128 times count curStep { ... return }`
with dynamic convergence checks (`repeat until`), so an entire coarse
solve compiles into the V-cycle without host synchronization.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

from exastencils_tpu.ops.reductions import dot, norm_l2


class KrylovResult(NamedTuple):
    sol: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray


def _ident(x):
    return x


def cg(
    A_apply: Callable,
    sol: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    bc_sol: Callable = _ident,
    bc_res: Callable = _ident,
    max_its: int = 128,
    res_reduction: float = 1e-3,
    dot_fn: Callable = dot,
    norm_fn: Callable = norm_l2,
) -> KrylovResult:
    """Conjugate gradients, matching the reference's generated CG
    (mgCycle@coarsest of 2D_FD_Poisson_fromL4.exa4):

        r = bc(rhs - A sol); p = bc(r)
        loop: Ap; alpha = <r,r>/<p,Ap>; sol += alpha p (bc);
              r -= alpha Ap (bc); early-exit on ||r|| <= eps*||r0||;
              beta = ||r_new||^2/||r||^2; p = bc(r + beta p)
    """
    r = bc_res(rhs - A_apply(sol))
    init_res = norm_fn(r)
    p = bc_res(r)

    def cond(c):
        it, _, _, _, _, done = c
        return jnp.logical_and(it < max_its, jnp.logical_not(done))

    def body(c):
        it, sol, r, p, cur_res, _ = c
        Ap = A_apply(p)
        alpha_nom = dot_fn(r, r)
        alpha_denom = dot_fn(p, Ap)
        alpha = alpha_nom / alpha_denom
        sol = bc_sol(sol + alpha * p)
        r = bc_res(r - alpha * Ap)
        next_res = norm_fn(r)
        done = next_res <= res_reduction * init_res
        beta = (next_res * next_res) / (cur_res * cur_res)
        p = bc_res(r + beta * p)
        return (it + 1, sol, r, p, next_res, done)

    it, sol, r, p, cur_res, done = lax.while_loop(
        cond, body, (jnp.int32(0), sol, r, p, init_res, init_res <= 0.0)
    )
    return KrylovResult(sol, it, cur_res)


def bicgstab(
    A_apply: Callable,
    sol: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    bc_sol: Callable = _ident,
    bc_res: Callable = _ident,
    max_its: int = 128,
    res_reduction: float = 1e-3,
    dot_fn: Callable = dot,
    norm_fn: Callable = norm_l2,
) -> KrylovResult:
    """BiCGStab (reference solver/l3/L3_BiCGStabForEquation.scala)."""
    r = bc_res(rhs - A_apply(sol))
    init_res = norm_fn(r)
    r0 = r
    p = bc_res(r)

    def cond(c):
        it, *_, done = c
        return jnp.logical_and(it < max_its, jnp.logical_not(done))

    def body(c):
        it, sol, r, p, _, _ = c
        Ap = A_apply(p)
        alpha = dot_fn(r, r0) / dot_fn(Ap, r0)
        s = bc_res(r - alpha * Ap)
        As = A_apply(s)
        omega = dot_fn(As, s) / dot_fn(As, As)
        sol = bc_sol(sol + alpha * p + omega * s)
        r_new = bc_res(s - omega * As)
        next_res = norm_fn(r_new)
        done = next_res <= res_reduction * init_res
        beta = (dot_fn(r_new, r0) / dot_fn(r, r0)) * (alpha / omega)
        p = bc_res(r_new + beta * (p - omega * Ap))
        return (it + 1, sol, r_new, p, next_res, done)

    it, sol, r, p, cur_res, done = lax.while_loop(
        cond, body, (jnp.int32(0), sol, r, p, init_res, init_res <= 0.0)
    )
    return KrylovResult(sol, it, cur_res)


def conjugate_residual(
    A_apply: Callable,
    sol: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    bc_sol: Callable = _ident,
    bc_res: Callable = _ident,
    max_its: int = 128,
    res_reduction: float = 1e-3,
    dot_fn: Callable = dot,
    norm_fn: Callable = norm_l2,
) -> KrylovResult:
    """Conjugate residual (reference L3_ConjugateResidualForEquation.scala)."""
    r = bc_res(rhs - A_apply(sol))
    init_res = norm_fn(r)
    p = bc_res(r)
    Ar = A_apply(r)
    Ap = Ar

    def cond(c):
        it, *_, done = c
        return jnp.logical_and(it < max_its, jnp.logical_not(done))

    def body(c):
        it, sol, r, p, Ar, Ap, _, _ = c
        rAr = dot_fn(r, Ar)
        alpha = rAr / dot_fn(Ap, Ap)
        sol = bc_sol(sol + alpha * p)
        r_new = bc_res(r - alpha * Ap)
        next_res = norm_fn(r_new)
        done = next_res <= res_reduction * init_res
        Ar_new = A_apply(r_new)
        beta = dot_fn(r_new, Ar_new) / rAr
        p = bc_res(r_new + beta * p)
        Ap = Ar_new + beta * Ap
        return (it + 1, sol, r_new, p, Ar_new, Ap, next_res, done)

    it, sol, r, p, Ar, Ap, cur_res, done = lax.while_loop(
        cond, body, (jnp.int32(0), sol, r, p, Ar, Ap, init_res, init_res <= 0.0)
    )
    return KrylovResult(sol, it, cur_res)


def minres(
    A_apply: Callable,
    sol: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    bc_sol: Callable = _ident,
    bc_res: Callable = _ident,
    max_its: int = 128,
    res_reduction: float = 1e-3,
    dot_fn: Callable = dot,
    norm_fn: Callable = norm_l2,
) -> KrylovResult:
    """MinRes in three-term CR-like form (reference L3_MinResForEquation.scala)."""
    return conjugate_residual(
        A_apply, sol, rhs,
        bc_sol=bc_sol, bc_res=bc_res, max_its=max_its,
        res_reduction=res_reduction, dot_fn=dot_fn, norm_fn=norm_fn,
    )


SOLVERS = {
    "CG": cg,
    "ConjugateGradient": cg,
    "BiCGStab": bicgstab,
    "MinRes": minres,
    "ConjugateResidual": conjugate_residual,
    "CR": conjugate_residual,
}
