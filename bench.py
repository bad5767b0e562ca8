"""Benchmark: 3D FD Poisson V(3,3)-cycle throughput on one TPU chip.

The reference's headline benchmark problem (Benchmark/Poisson3D/
3D_FD_Poisson_fromL4.*, driven by Benchmark/run_benchmark.py).  Prints
ONE JSON line:
  metric      : poisson3d_vcycle_glups (fine-grid DOFs processed per
                second of V-cycle, in 1e9 lattice-updates/s)
  vs_baseline : fraction of the speed-of-light HBM roofline for the
                cycle (BASELINE.md target: smoothers >= 70% of roofline)
"""

import json
import os
import sys
import time


def main():
    size_level = int(os.environ.get("BENCH_LEVEL", "9"))  # 2^9 = 512^3 cells
    n_timed = int(os.environ.get("BENCH_ITERS", "10"))

    import jax
    import jax.numpy as jnp

    from exastencils_tpu.config import Knowledge
    from exastencils_tpu.models.poisson import PoissonMGSolver
    from exastencils_tpu.runtime.performance import (
        HBM_BANDWIDTH,
        VCycleTrafficModel,
        detect_chip,
    )

    platform = jax.devices()[0].platform
    chip = detect_chip()
    if platform == "cpu":
        size_level = min(size_level, int(os.environ.get("BENCH_LEVEL", "6")))

    k = Knowledge(
        dimensionality=3,
        minLevel=0,
        maxLevel=size_level,
        useDblPrecision=False,
        tpu_compute_dtype="float32",
    ).update()
    solver = PoissonMGSolver(k)
    sol, rhs = solver.init_state()

    cycle = solver._cycle
    # warmup / compile
    t0 = time.perf_counter()
    sol1 = cycle(sol, rhs)
    jax.block_until_ready(sol1)
    compile_s = time.perf_counter() - t0

    # sanity: residual must drop
    r0 = float(solver._res_norm(sol, rhs))
    r1 = float(solver._res_norm(sol1, rhs))
    assert r1 < 0.1 * r0, f"V-cycle not converging: {r0} -> {r1}"

    # timed loop (sequential dependency keeps the device busy end-to-end)
    s = sol
    t0 = time.perf_counter()
    for _ in range(n_timed):
        s = cycle(s, rhs)
    jax.block_until_ready(s)
    elapsed = time.perf_counter() - t0

    n = (1 << size_level) + 1
    fine_dofs = float(n) ** 3
    glups = fine_dofs * n_timed / elapsed / 1e9

    model = VCycleTrafficModel(ndim=3, dtype_bytes=4, check_residual=False)
    bw = HBM_BANDWIDTH.get(chip, HBM_BANDWIDTH["cpu"])
    roofline = model.roofline_glups(bw)

    print(
        json.dumps(
            {
                "metric": "poisson3d_vcycle_glups",
                "value": round(glups, 4),
                "unit": "GLUP/s",
                "vs_baseline": round(glups / roofline, 4),
                "detail": {
                    "grid": f"{1 << size_level}^3",
                    "chip": chip,
                    "platform": platform,
                    "cycle_ms": round(elapsed / n_timed * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "roofline_glups": round(roofline, 3),
                    "residual_drop_1cycle": r1 / r0,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
