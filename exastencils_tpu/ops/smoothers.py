"""Smoother sweeps on dense level arrays.

Reference: the L3 solver generator's smoother synthesis
(solver/l3/L3_SolverForEquation.scala smoother generation; coloring via
the L4 `color with { (i0+i1) % 2, ... }` construct) — damped Jacobi,
red-black Gauss-Seidel (as colored Jacobi half-sweeps), and multi-color
variants.

Global parity: color masks are computed from *global* indices so shard
boundaries keep red/black phase consistency (SURVEY.md §7 hard parts);
`index_offset` lets the sharded backend pass each shard's global origin.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from exastencils_tpu.core.stencil import BoundStencil
from exastencils_tpu.ops.stencil_apply import apply_stencil


def color_mask(
    shape: Tuple[int, ...],
    color: int,
    num_colors: int = 2,
    index_offset: Tuple[int, ...] = None,
    color_fn: Callable = None,
) -> jnp.ndarray:
    """Mask of DOFs with `(sum_d i_d) % num_colors == color` (default), or a
    custom `color_fn(*index_grids) % num_colors == color`."""
    nd = len(shape)
    if index_offset is None:
        index_offset = (0,) * nd
    grids = [
        lax.broadcasted_iota(jnp.int32, shape, d) + index_offset[d] for d in range(nd)
    ]
    expr = color_fn(*grids) if color_fn is not None else sum(grids)
    return (expr % num_colors) == color


def jacobi_update(
    sol: jnp.ndarray,
    rhs: jnp.ndarray,
    A: BoundStencil,
    omega: float,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """sol += omega / diag(A) * (rhs - A sol), optionally only where `mask`.

    Matches the generated smoother loop body
    `Solution += omega / diag(L) * (RHS - L * Solution)` (SURVEY.md §3.3
    hot loop); the caller re-applies bc afterwards, mirroring the
    `loop ...; apply bc` statement pair."""
    corr = (omega / A.diag()) * (rhs - apply_stencil(A, sol))
    if mask is None:
        return sol + corr
    return jnp.where(mask, sol + corr, sol)


def make_smoother(
    A: BoundStencil,
    bc_apply: Callable,
    exchange: Callable = None,
    omega: float = 1.0,
    coloring: Sequence[jnp.ndarray] = None,
):
    """One smoother iteration sol, rhs -> sol.

    coloring = None      : damped Jacobi (single masked-free update)
    coloring = [m0, m1]  : colored Gauss-Seidel — one masked Jacobi
                           half-sweep per color with halo exchange + bc
                           between colors, exactly the expansion of the
                           reference's `color with` loop."""
    exchange = exchange or (lambda x: x)

    if coloring is None:

        def smooth(sol, rhs):
            sol = exchange(sol)
            sol = jacobi_update(sol, rhs, A, omega)
            return bc_apply(sol)

        return smooth

    def smooth_colored(sol, rhs):
        for mask in coloring:
            if callable(mask):
                mask = mask()  # trace-time mask construction (iota-based)
            sol = exchange(sol)
            sol = jacobi_update(sol, rhs, A, omega, mask)
            sol = bc_apply(sol)
        return sol

    return smooth_colored
