"""Multi-chip dry run: compile + execute one full distributed multigrid
step (V-cycle with halo exchange, colored smoothing, CG coarse solve,
global reductions) over an n-device mesh on tiny shapes.

Used by __graft_entry__.dryrun_multichip; runs on
xla_force_host_platform_device_count virtual CPU devices the way the
reference tests MPI layouts with `mpirun --oversubscribe`
(Utilities/run_exastencils.py:49-58).
"""

from __future__ import annotations

import jax
import numpy as np


def _factor2d(n: int):
    px = int(np.floor(np.sqrt(n)))
    while n % px:
        px -= 1
    return px, n // px


def run_dryrun(n_devices: int) -> None:
    import os

    if n_devices > 1 and not os.environ.get("EXATPU_DRYRUN_REAL_DEVICES"):
        # Switch to the virtual-device CPU platform BEFORE any backend is
        # initialized: the axon sitecustomize hook forces
        # jax_platforms="axon,cpu" (single TPU), and once jax.devices()
        # has run the platform can no longer change.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )

    from exastencils_tpu.config import Knowledge
    from exastencils_tpu.models.poisson import PoissonMGSolver
    from exastencils_tpu.parallel.mesh import make_domain_mesh

    px, py = _factor2d(n_devices)
    # coarsest level must stay divisible by the shard counts
    min_level = max(int(np.ceil(np.log2(max(px, py, 2)))), 1)
    k = Knowledge(
        dimensionality=2,
        minLevel=min_level,
        maxLevel=min_level + 3,
        useDblPrecision=False,
        tpu_compute_dtype="float32",
    ).update()

    mesh = make_domain_mesh((px, py), devices=devices[:n_devices])
    solver = PoissonMGSolver(k, mesh=mesh, shard_dims=(px, py))

    sol, rhs = solver.init_state()
    sol = solver._cycle(sol, rhs)
    res = solver._res_norm(sol, rhs)
    jax.block_until_ready((sol, res))
    print(
        f"dryrun: mesh {px}x{py}, levels {k.minLevel}..{k.maxLevel}, "
        f"residual after 1 cycle = {float(res):.3e}"
    )
