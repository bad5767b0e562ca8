"""Pallas TPU kernel library — the analog of the reference's CUDA
backend (parallelization/api/cuda/): hot loop nests lowered to hand-
scheduled kernels, with the jnp ops as the always-correct host path.

Selection policy (mirrors cuda_preferredExecution="Performance",
config/Knowledge.scala:639): kernels are used automatically on the
dense backend when `Knowledge.tpu_use_pallas` and the op matches a
kernel's contract (constant star stencil, Dirichlet bc, shapes that fit
the VMEM window); everything else falls back to jnp/XLA.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from exastencils_tpu.core.field import DirichletBC, Field
from exastencils_tpu.ops.pallas.stream3d import (
    pallas_applicable_3d,
    rbgs_fused_3d,
)


def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def make_fused_smoother_3d(
    A, field: Field, level: int, shape, omega: float, num_colors: int,
    color_fn=None,
) -> Optional[Callable]:
    """Fused K-iteration RBGS for the dense 3D path, or None if the
    configuration is outside the kernel contract.  Returns
    smooth_n(n, sol, rhs)."""
    if num_colors != 2 or color_fn is not None:
        return None
    if not isinstance(field.bc_at(level), DirichletBC):
        return None
    if not pallas_applicable_3d(tuple(shape), A.offsets, A.coefs):
        return None
    interp = _interpret_mode()
    offsets, coefs = A.offsets, A.coefs

    def smooth_n(n, sol, rhs):
        return rbgs_fused_3d(sol, rhs, offsets, coefs, omega, n, interpret=interp)

    return smooth_n
