"""Benchmark: 3D FD Poisson V(3,3)-cycle throughput on one TPU chip.

The reference's headline benchmark problem (Benchmark/Poisson3D/
3D_FD_Poisson_fromL4.*, driven by Benchmark/run_benchmark.py).  Prints
ONE JSON line:
  metric      : poisson3d_vcycle_glups (fine-grid DOFs processed per
                second of V-cycle, in 1e9 lattice-updates/s)
  vs_baseline : fraction of the speed-of-light HBM roofline for the
                cycle (BASELINE.md target: smoothers >= 70% of roofline)
  detail.dsl_glups : the same V(3,3)-cycle through the full DSL path
                (examples/poisson_3d_bench.exa4 staged by the L4
                interpreter) — the product's user-facing route

Env knobs: BENCH_LEVEL (grid 2^L), BENCH_ITERS, BENCH_DSL=0 to skip the
DSL run, BENCH_DSL_LEVEL to size it separately.
"""

import json
import os
import sys
import time


def bench_dsl(size_level: int, n_timed: int):
    """Time MGCycle@finest of the DSL benchmark program (staged L4
    interpreter path — what a user of the framework actually runs)."""
    import jax

    from exastencils_tpu.config import Knowledge
    from exastencils_tpu.dsl.interpreter import L4Executable, Frame
    from exastencils_tpu.dsl.parser import parse_l4

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "poisson_3d_bench.exa4")
    k = Knowledge(
        dimensionality=3,
        minLevel=1,
        maxLevel=size_level,
        useDblPrecision=False,
        tpu_compute_dtype="float32",
    ).update()
    import jax.numpy as jnp

    prog = parse_l4(base)
    ex = L4Executable(prog, k, out=lambda s: None)
    finest = k.maxLevel
    ex.call_function(ex.functions[("InitF", finest)], finest, [])
    cyc = ex.functions[("MGCycle", finest)]

    def readback():
        # anchor timing on an actual value transfer: block_until_ready
        # can return early through the axon tunnel
        return float(jnp.sum(jnp.abs(ex.state[("U", finest)])))

    t0 = time.perf_counter()
    ex.call_function(cyc, finest, [])  # warmup / staged compiles
    readback()
    compile_s = time.perf_counter() - t0

    elapsed = None
    for _ in range(2):  # best-of-2: tunnel latency spikes are transient
        t0 = time.perf_counter()
        for _ in range(n_timed):
            ex.call_function(cyc, finest, [])
        readback()
        dt = time.perf_counter() - t0
        elapsed = dt if elapsed is None else min(elapsed, dt)

    n = (1 << size_level) + 1
    glups = float(n) ** 3 * n_timed / elapsed / 1e9
    return glups, elapsed / n_timed, compile_s


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

    cycle = solver._cycle  # donates the iterate — copy before reuse
    r0 = float(solver._res_norm(sol, rhs))
    # warmup / compile
    t0 = time.perf_counter()
    sol1 = cycle(jnp.copy(sol), rhs)
    jax.block_until_ready(sol1)
    compile_s = time.perf_counter() - t0

    # sanity: residual must drop
    r1 = float(solver._res_norm(sol1, rhs))
    assert r1 < 0.1 * r0, f"V-cycle not converging: {r0} -> {r1}"

    # timed loop (sequential dependency keeps the device busy end-to-end);
    # anchored on a value transfer — block_until_ready can return early
    # through the axon tunnel.  Best-of-2: tunnel latency spikes are
    # transient and must not masquerade as kernel time.
    elapsed = None
    for _ in range(2):
        s = jnp.copy(sol)  # fresh iterate: cycle donates its input
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(n_timed):
            s = cycle(s, rhs)
        float(jnp.sum(jnp.abs(s)))
        dt = time.perf_counter() - t0
        elapsed = dt if elapsed is None else min(elapsed, dt)

    n = (1 << size_level) + 1
    fine_dofs = float(n) ** 3
    glups = fine_dofs * n_timed / elapsed / 1e9

    # vs_baseline stays keyed to the per-pass HBM roofline (the same
    # denominator as earlier rounds, so the series is comparable);
    # values > 1 mean the Pallas whole-leg fusion moves LESS memory than
    # the per-pass formulation's speed of light.  detail reports the
    # tighter fused-traffic roofline too — the gap to it is VPU compute
    # (14 flops x 2-colors per masked update), not HBM.
    model = VCycleTrafficModel(ndim=3, dtype_bytes=4, check_residual=False)
    bw = HBM_BANDWIDTH.get(chip, HBM_BANDWIDTH["cpu"])
    roofline = model.roofline_glups(bw)
    # report the kernel mode ACTUALLY selected by synthesis (advisor r3
    # #4: n_pre/n_post beyond k_max or a non-star stencil can silently
    # fall back to pairwise transfers or plain XLA)
    # judge by the finest level: tiny coarse levels legitimately fall
    # back (pallas_applicable_3d needs nz >= 5) without hurting traffic
    top = solver.mg.levels[k.maxLevel]
    if top.down_leg_fn is not None:
        kernel_mode = "pallas-whole-leg"
    elif top.res_restrict_fn is not None:
        kernel_mode = "pallas-pairwise"
    elif top.smooth_n is not None:
        kernel_mode = "pallas-smoother"
    else:
        kernel_mode = "xla"
    roofline_fused = VCycleTrafficModel(
        ndim=3, dtype_bytes=4, check_residual=False,
        fused_smoother=True, fused_legs=True, fused_level=True,
    ).roofline_glups(bw)

    detail = {
        "grid": f"{1 << size_level}^3",
        "chip": chip,
        "platform": platform,
        "cycle_ms": round(elapsed / n_timed * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "roofline_glups": round(roofline, 3),
        "roofline_fused_glups": round(roofline_fused, 3),
        "vs_fused_roofline": round(glups / roofline_fused, 4),
        "kernel_mode": kernel_mode,
        "residual_drop_1cycle": r1 / r0,
    }

    if os.environ.get("BENCH_SHARDED", "1") != "0" and platform == "tpu":
        # the distributed formulation on one chip: shard_map + wide-halo
        # Pallas smoothers over a 1x1x1 mesh — measures what the sharded
        # path costs relative to the dense formulation (multi-chip runs
        # divide the grid over real mesh axes; see tests/test_sharded_pallas)
        from exastencils_tpu.parallel.mesh import make_domain_mesh

        mesh = make_domain_mesh((1, 1, 1), devices=jax.devices()[:1])
        ssolver = PoissonMGSolver(k, mesh=mesh, shard_dims=(1, 1, 1))
        ssol, srhs = ssolver.init_state()
        scycle = ssolver._cycle
        s1 = scycle(jnp.copy(ssol), srhs)
        jax.block_until_ready(s1)
        selapsed = None
        for _ in range(2):
            s = jnp.copy(ssol)
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            for _ in range(n_timed):
                s = scycle(s, srhs)
            float(jnp.sum(jnp.abs(s)))
            dt = time.perf_counter() - t0
            selapsed = dt if selapsed is None else min(selapsed, dt)
        detail["sharded_glups"] = round(fine_dofs * n_timed / selapsed / 1e9, 4)
        detail["sharded_cycle_ms"] = round(selapsed / n_timed * 1e3, 3)
        top = ssolver.gen.mg.levels[k.maxLevel]
        detail["sharded_kernel_mode"] = (
            "pallas-fused-smoother" if top.smooth_n is not None else "xla")

    if os.environ.get("BENCH_DSL", "1") != "0":
        dsl_level = int(os.environ.get("BENCH_DSL_LEVEL", str(size_level)))
        if platform == "cpu":
            dsl_level = min(dsl_level, 6)
        dsl_glups, dsl_cycle_s, dsl_compile_s = bench_dsl(dsl_level, n_timed)
        detail["dsl_glups"] = round(dsl_glups, 4)
        detail["dsl_grid"] = f"{1 << dsl_level}^3"
        detail["dsl_cycle_ms"] = round(dsl_cycle_s * 1e3, 3)
        detail["dsl_compile_s"] = round(dsl_compile_s, 1)
        detail["dsl_vs_api"] = round(dsl_glups / glups, 4)

    print(
        json.dumps(
            {
                "metric": "poisson3d_vcycle_glups",
                "value": round(glups, 4),
                "unit": "GLUP/s",
                "vs_baseline": round(glups / roofline, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
