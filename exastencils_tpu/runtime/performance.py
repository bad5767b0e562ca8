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
# Where the fused-roofline gap goes (round-4 audit, VERDICT r3 item 3)
#
# Measured: 6.6 GLUP/s at 512^3 f32 on v5e = 23% of the fused-traffic
# roofline (28.7 GLUP/s).  The gap is NOT HBM revisiting — it is VPU
# compute.  Op count per whole-leg pass with K=3 RBGS:
#
#   per half-sweep update (one color):
#     star apply  : 7 mul + 6 add               = 13 VPU ops (7 fused)
#     correction  : (rhs - Au) * (w/diag) + sol =  3 ops
#     parity mask : 2 iota + add + mod + cmp    ~  5 ops
#     select      : where                        =  1 op
#     boundary    : iota-based interior mask    ~  3 ops (shared)
#   ~> 22 ops/point/half-sweep; K=3 two-color legs run 6 half-sweeps
#      per point per leg, plus residual+transfer work on the down leg.
#
#   512^3 * ~140 ops/cycle ~ 19 Gop; v5e VPU ~ 4 ALU * 8x128 lanes *
#   0.94 GHz ~ 3.9 Gop/s/1e3 => ~12 ms compute vs ~4 ms HBM traffic
#   (3.3 GB/cycle at 819 GB/s).  The kernel is therefore COMPUTE-bound
#   at ~60% VPU utilization; measured 20.4 ms/cycle is consistent with
#   compute + imperfect overlap of the z-plane pipeline.
#
# Levers, in order of expected value (none change golden semantics):
#   1. [MEASURED, REJECTED] hoisting the parity mask out of the K-loop
#      (all of one grid step's updates share parity (p-1) mod 2) was
#      tried in round 4 and REGRESSED 20.5 -> 22.1 ms/cycle: keeping the
#      ny x nx mask live across the update loop costs more (VMEM value
#      lifetime / lost fusion into the select) than recomputing the
#      3-op parity term per update.  Mosaic fuses the inline form.
#   2. fewer half-sweep passes over the window per plane step by
#      updating two z-planes per grid step (halves per-step overhead);
#   3. MXU offload of the y/x neighbor sums as banded matmuls — only
#      ~2.3% MXU density for radius-1 stencils, roughly VPU-equal on
#      v5e, NOT a win until wider stencils/batched RHS;
#   4. bf16 storage with f32 compute halves HBM bytes but the kernel is
#      compute-bound, so gains appear only after (2).
# ----------------------------------------------------------------------
