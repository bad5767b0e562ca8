"""Roofline performance model.

Reference: performance/ir/IR_EvaluatePerformanceEstimates.scala:43
(per-loop-nest estimate from field-access bytes vs FLOPs against the
Platform hardware model; used there to choose CPU-vs-CUDA execution and
blocking factors).  Here the same bytes-per-DOF accounting against the
TPU HBM bandwidth yields the speed-of-light estimate that bench.py
reports against (`vs_baseline`), and will drive Pallas block-size /
fusion choices.
"""

from __future__ import annotations

from dataclasses import dataclass

# per-chip HBM bandwidth (B/s); TPU generations
HBM_BANDWIDTH = {
    "v4": 1.2e12,
    "v5e": 8.19e11,
    "v5p": 2.765e12,
    "v6e": 1.64e12,
    "cpu": 5.0e10,
}


def detect_chip() -> str:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN")
    if gen:
        return gen
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
        for key in HBM_BANDWIDTH:
            if key in kind.replace(" ", ""):
                return key
        if "lite" in kind:
            return "v5e"
    except Exception:
        pass
    return "cpu"


@dataclass
class VCycleTrafficModel:
    """Ideal HBM bytes per *fine-grid DOF* for one V(pre,post) cycle of a
    (2d+1)-point multigrid solver, assuming perfect fusion (each array
    read/written once per pass, neighbor reuse in VMEM).

    Smoother half-sweep (one color): read sol + rhs, write sol = 3 arrays.
    Residual: read sol + rhs, write res = 3.  Restrict: read res, write
    coarse rhs (1/2^d).  Prolong+correct: read coarse sol (1/2^d) + sol,
    write sol.  Convergence check: residual + norm read.
    """

    ndim: int = 3
    n_pre: int = 3
    n_post: int = 3
    colors: int = 2
    dtype_bytes: int = 4
    check_residual: bool = True
    # kernel-fusion level achieved by the implementation (bench passes
    # the actual configuration so vs_baseline stays a fraction of the
    # speed of light *of the algorithm as compiled*):
    #   fused_smoother: K iterations per memory pass (Pallas temporal
    #     blocking) -> 3 arrays per smoothing block instead of per
    #     half-sweep (stream3d.rbgs_fused_3d)
    #   fused_legs: residual+restrict / prolong+correct single passes
    #     (stream3d.res_restrict_fused_3d / prolong_correct_fused_3d)
    #   fused_level: the ENTIRE down leg (pre-smooth+residual+restrict)
    #     and up leg (prolong+correct+post-smooth) are each one pass
    #     (stream3d.smooth_res_restrict_fused_3d /
    #     prolong_correct_smooth_fused_3d) -> 3+1/2^d arrays per leg
    fused_smoother: bool = False
    fused_legs: bool = False
    fused_level: bool = False

    def bytes_per_fine_dof(self) -> float:
        level_sum = 1.0 / (1.0 - 0.5 ** self.ndim)  # sum over levels of (1/2^d)^l
        ratio = 0.5 ** self.ndim
        if self.fused_level:
            per_level = 2 * (3 + ratio)  # one pass down, one pass up
        else:
            if self.fused_smoother:
                smoother = 2 * 3  # one 3-array block for pre, one for post
            else:
                smoother = (self.n_pre + self.n_post) * self.colors * 3
            if self.fused_legs:
                residual = 0
                restrict = 2 + ratio  # read sol+rhs, write coarse rhs
                prolong = 2 + ratio  # read sol + coarse sol, write sol
            else:
                residual = 3
                restrict = 1 + ratio
                prolong = 2 + ratio
            per_level = smoother + residual + restrict + prolong
        check = (3 + 1) if self.check_residual else 0  # residual + norm read, finest only
        return (per_level * level_sum + check) * self.dtype_bytes

    def roofline_glups(self, bandwidth: float) -> float:
        return bandwidth / self.bytes_per_fine_dof() / 1e9


def smoother_traffic_bytes(ndim: int, dtype_bytes: int = 4, colors: int = 2) -> float:
    """Ideal bytes per DOF for one full smoother iteration (all colors)."""
    return colors * 3 * dtype_bytes


# ----------------------------------------------------------------------
# Where the fused-roofline gap goes — round-5 audit (supersedes the
# round-4 "VPU-compute-bound" analysis, which measurement REFUTED)
#
# All numbers: 513^3 f32, K=3 RBGS, device-side chained timing (20
# iterations inside one fori_loop — per-call dispatch through the axon
# tunnel adds ~2.3 ms and contaminated earlier per-call micro-timings).
#
#   measured stream triad (3-array pass)   : 4.4 ms  -> ~356 GB/s
#     (512^3 aligned: 419 GB/s; flat-2D: 417; padded x=640: same WALL
#      time as 513 -> row padding buys nothing; big aligned 2D ~0.5-1GB
#      arrays: up to ~600 GB/s.  The 819 GB/s v5e SPEC rate is NOT
#      attainable in this environment at these shapes.)
#   rbgs fused kernel, 6 half-sweeps/pass  : 7.1 ms  (1.6 GB -> 228 GB/s
#      effective = 64% of the measured stream rate)
#   K=0 pipeline floor (ingest+emit only)  : ~5.6 ms — the windowed
#      z-plane pipeline itself, NOT the update math, dominates.
#
# Ablations (each measured on the real chip, wall-clock):
#   - remove parity-mask arithmetic entirely      : ~0  (Mosaic fuses it)
#   - remove all rolls (neighbor shifts)          : NEGATIVE (slower!)
#   - bf16 storage+compute                        : NEGATIVE (16 ms)
#   - x=512 grid (no lane padding)                : ~6%
#   - W=16 power-of-two window                    : ~0
#   - plane-PAIR steps w/ static parity (v2)      : +5% (adopted,
#       stream3d_pair.py; also halves DMA descriptor count)
#   - packed red-black storage (half-width R/B
#     arrays, no wasted half-plane compute)       : NEGATIVE (11.6 vs
#       10.7 ms) — conclusively disproving the compute-bound theory
#   - MXU banded-matmul offload (round-4)         : NEGATIVE at r=1
#
# Conclusion: the binding constraints are (a) the MEASURED achievable
# HBM bandwidth (~45% of spec through this tunneled single-chip
# environment) and (b) ~36% pipeline overhead of the streaming window
# schedule.  bench.py therefore reports the measured stream rate and a
# measured-bandwidth fused roofline (vs_fused_roofline_measured) next
# to the spec-based number; the remaining honest levers are pipeline-
# level (deeper DMA batching), not arithmetic.
#
# Round-5 shipped state (BENCH detail on the real chip, 512^3 f32):
#   dense V(3,3)           : 6.71 GLUP/s  (20.1 ms/cycle)
#   full-cycle A/B         : v1 single-plane 23.2 ms, v2 pair 20.1 ms
#   stream triad (measured): 359 GB/s -> fused roofline 12.6 GLUP/s
#   vs_fused measured/spec : 0.53 / 0.23
#   sharded (1x1x1 mesh)   : 6.68 GLUP/s = 99.6% of dense (was 54% in
#     round 4) — per-dim ghost widths + sharded whole-leg fusion
# ----------------------------------------------------------------------
