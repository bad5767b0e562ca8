"""Poisson model family (FD, node-based) — the reference's flagship problem.

Reference inputs reproduced:
  * Examples/Poisson/2D_FD_Poisson_fromL4.exa4 (+ Testing/Poisson goldens)
  * Benchmark/Poisson3D/3D_FD_Poisson_fromL4.exa4 (perf problem)

`PoissonMGSolver` assembles the same algorithm the reference *generates*:
damped red-black Gauss-Seidel V(3,3)-cycles with bilinear transfers and a
CG coarse-grid solve, as one jitted XLA program per cycle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional

import jax.numpy as jnp

from exastencils_tpu.config import Knowledge
from exastencils_tpu.core.domain import Domain, unit_domain
from exastencils_tpu.core.field import DirichletBC, Field
from exastencils_tpu.core.grid import NODE, level_grids
from exastencils_tpu.core.stencil import Stencil, node_prolongation, node_restriction
from exastencils_tpu.ops.smoothers import make_smoother
from exastencils_tpu.ops.stencil_apply import apply_stencil
from exastencils_tpu.solver.krylov import SOLVERS
from exastencils_tpu.solver.mg import Multigrid, MGLevelOps
from exastencils_tpu.utils.printing import reduced_prec_str


def laplace_stencil(ndim: int) -> Stencil:
    """Standard (2*ndim+1)-point FD Laplacian with grid-width-dependent
    coefficients (reference: `Stencil Laplace@all` in
    2D_FD_Poisson_fromL4.exa4; sign convention -Delta)."""
    st = Stencil("Laplace")
    st.add_entry(
        (0,) * ndim,
        lambda g: sum(2.0 / g.grid_width(d) ** 2 for d in range(g.ndim)),
    )
    for d in range(ndim):
        for s in (-1, 1):
            off = tuple(s if i == d else 0 for i in range(ndim))
            st.add_entry(off, lambda g, d=d: -1.0 / g.grid_width(d) ** 2)
    return st


# --- the reference example's manufactured solution (2D) ---
def default_solution_2d(x, y):
    return jnp.cos(math.pi * x) - jnp.sin(2.0 * math.pi * y)


def default_rhs_2d(x, y):
    return (math.pi ** 2) * jnp.cos(math.pi * x) - 4.0 * (math.pi ** 2) * jnp.sin(
        2.0 * math.pi * y
    )


# --- 3D variants (Benchmark/Poisson3D) ---
def default_solution_3d(x, y, z):
    return jnp.cos(math.pi * x) - jnp.sin(2.0 * math.pi * y) + jnp.cos(3.0 * math.pi * z)


def default_rhs_3d(x, y, z):
    pi2 = math.pi ** 2
    return (
        pi2 * jnp.cos(math.pi * x)
        - 4.0 * pi2 * jnp.sin(2.0 * math.pi * y)
        + 9.0 * pi2 * jnp.cos(3.0 * math.pi * z)
    )


@dataclass
class PoissonMGSolver:
    """FD Poisson with geometric multigrid on [0,1]^d.

    Runs on either execution backend: the dense single-chip path, or the
    fragment-sharded multi-chip path (pass `backend` or set
    knowledge.tpu_mesh_shape)."""

    knowledge: Knowledge
    bc_fn: Callable = None  # Dirichlet boundary value g(x, y[, z])
    rhs_fn: Callable = None
    exact_fn: Callable = None  # for error reporting (PrintError@finest)
    omega: float = 0.8
    n_pre: int = 3
    n_post: int = 3
    cgs: str = "CG"
    cgs_max_its: int = 128
    cgs_res_reduction: float = 1e-3
    domain: Optional[Domain] = None
    backend: object = None
    mesh: object = None  # jax.sharding.Mesh -> use the sharded backend
    shard_dims: Optional[tuple] = None  # shards per spatial dim

    def __post_init__(self):
        k = self.knowledge
        nd = k.dimensionality
        if self.bc_fn is None:
            self.bc_fn = default_solution_2d if nd == 2 else default_solution_3d
        if self.rhs_fn is None:
            self.rhs_fn = default_rhs_2d if nd == 2 else default_rhs_3d
        if self.exact_fn is None:
            self.exact_fn = self.bc_fn
        if self.domain is None:
            self.domain = unit_domain(nd)
        self.dtype = k.real_dtype
        self.grids = level_grids(self.domain, k, dtype=self.dtype)
        self.stencil = laplace_stencil(nd)
        self.restrict_op = node_restriction(nd)
        self.prolong_op = node_prolongation(nd)

        if self.backend is None:
            if self.mesh is not None:
                from exastencils_tpu.parallel.backend import ShardedBackend

                dims = self.shard_dims or tuple(self.mesh.devices.shape)
                self.backend = ShardedBackend(self.grids, self.mesh, dims)
            else:
                from exastencils_tpu.parallel.backend import DenseBackend

                self.backend = DenseBackend(self.grids)

        # field declarations (reference field block of the L4 example)
        self.solution = Field(
            "Solution",
            self.domain,
            NODE,
            bc={k.maxLevel: DirichletBC(self.bc_fn)}
            | {lvl: DirichletBC(0.0) for lvl in range(k.minLevel, k.maxLevel)},
        )
        self.residual_f = Field("Residual", self.domain, NODE, bc=DirichletBC(0.0))
        self.rhs_f = Field("RHS", self.domain, NODE, bc=None)

        levels: Dict[int, MGLevelOps] = {}
        for lvl in range(k.minLevel, k.maxLevel + 1):
            g = self.grids[lvl]
            h = self.backend.handle(lvl)
            A = self.stencil.bind(g)
            bc_sol = h.bc_applier(self.solution, lvl)
            bc_res = h.bc_applier(self.residual_f, lvl)
            smooth = make_smoother(
                A, bc_sol, exchange=h.exchange, omega=self.omega,
                coloring=h.color_masks(2),
            )
            restrict_fn = prolong_fn = None
            if lvl > k.minLevel:
                restrict_fn, prolong_fn = self.backend.transfer_fns(
                    lvl, self.restrict_op, self.prolong_op
                )
            levels[lvl] = MGLevelOps(
                grid=g,
                shape=h.work_shape,
                A_apply=partial(apply_stencil, A),
                smooth=smooth,
                bc_sol=bc_sol,
                bc_res=bc_res,
                exchange=h.exchange,
                restrict_fn=restrict_fn,
                prolong_fn=prolong_fn,
                dot_fn=h.dot,
                norm_fn=h.norm_l2,
            )
        self.levels = levels

        lv0 = levels[k.minLevel]
        krylov = SOLVERS[self.cgs]

        def coarse_solve(sol, rhs):
            return krylov(
                lambda p: lv0.A_apply(lv0.exchange(p)),
                sol,
                rhs,
                bc_sol=lv0.bc_sol,
                bc_res=lv0.bc_res,
                max_its=self.cgs_max_its,
                res_reduction=self.cgs_res_reduction,
                dot_fn=lv0.dot_fn,
                norm_fn=lv0.norm_fn,
            ).sol

        self.mg = Multigrid(
            levels=levels,
            min_level=k.minLevel,
            max_level=k.maxLevel,
            coarse_solve=coarse_solve,
            n_pre=self.n_pre,
            n_post=self.n_post,
            cycle_type=k.mg_cycle,
        )

        # wrapped step functions (shard_mapped on the sharded backend)
        b = self.backend
        self._cycle = b.wrap(self.mg.cycle, ("field", "field"), "field")
        self._res_norm = b.wrap(self.mg.res_norm, ("field", "field"), "scalar")
        self._err = b.wrap(self._max_error_local, ("field",), "scalar")

    # ------------------------------------------------------------------
    def init_state(self):
        """initFieldsWithZero + InitRHS@finest + apply bc to Solution@finest
        (reference Function Application of the L4 example)."""
        k = self.knowledge
        lv = self.levels[k.maxLevel]
        b = self.backend

        def build():
            h = b.handle(k.maxLevel)
            sol = lv.bc_sol(h.zeros(self.dtype))
            rhs = h.init_field_local(self.rhs_fn, self.dtype)
            return sol, rhs

        return b.wrap(build, (), ("field", "field"))()

    def _max_error_local(self, sol):
        h = self.backend.handle(self.knowledge.maxLevel)
        exact = self.exact_fn(*h.coords())
        return h.norm_max(sol - exact)

    def max_error(self, sol):
        return self._err(sol)

    # ------------------------------------------------------------------
    def solve(
        self,
        max_its: int = 100,
        target_res_reduction: float = 1e-10,
        out=None,
        print_error: bool = True,
    ):
        """Host-driven solve with the exact print sequence of Solve@finest
        (initial residual, then per cycle: max error, residual) in
        reduced precision — diffable against Testing/Poisson/*.results."""
        lines = []
        emit = out if out is not None else lines.append

        sol, rhs = self.init_state()

        def callback(it, s, cur_res):
            if print_error:
                emit(reduced_prec_str(float(self._err(s))))
            emit(reduced_prec_str(float(cur_res)))

        res0 = self._res_norm(sol, rhs)
        emit(reduced_prec_str(float(res0)))
        sol, init_res, cur_res, it = self.mg.solve(
            sol,
            rhs,
            target_res_reduction,
            max_its,
            callback,
            cycle_fn=self._cycle,
            res_norm_fn=self._res_norm,
        )
        return sol, lines, float(init_res), float(cur_res), it

    # ------------------------------------------------------------------
    def solve_fused(self, max_its: int = 100, target_res_reduction: float = 1e-10):
        """Fully device-resident solve (lax.while_loop, no host sync) —
        the production/benchmark path."""
        sol, rhs = self.init_state()
        fused = self.backend.wrap(
            lambda s, r: self.mg.solve_jit(s, r, target_res_reduction, max_its),
            ("field", "field"),
            ("field", "scalar", "scalar", "scalar"),
        )
        return fused(sol, rhs)
