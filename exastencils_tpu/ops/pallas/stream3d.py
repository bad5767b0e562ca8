"""Streaming wavefront Pallas kernels for 3D star-stencil multigrid.

These are the TPU-native analog of the reference's CUDA kernel
extraction + temporal blocking: where the reference lowers the smoother
loop nest to a CUDA_Kernel (parallelization/api/cuda/CUDA_Kernel.scala)
and fuses sweeps with `repeat ... with contraction` (IR_ContractingLoop,
baseExt/ir/IR_ContractingLoop.scala:43), here a single Pallas program
streams z-planes HBM->VMEM through a sliding window and applies K full
red-black Gauss-Seidel iterations in ONE pass over memory (3 array
passes total: read sol, read rhs, write sol) instead of 6*K passes for
the unfused XLA path.

Wavefront schedule: when plane p arrives, the kernel applies, in order,
red-iteration-k to plane p-(2k-1) and black-iteration-k to plane p-2k
for k = 1..K.  Gauss-Seidel dependencies hold by construction: a red
update of plane q at iteration k reads black values of planes q-1..q+1
which are exactly at state black-(k-1); a black update reads red values
at state red-k.  Updates are in place in the VMEM window (red and black
lattice sites are disjoint).  Domain-boundary nodes (Dirichlet) are
never written, preserving their bc values -- identical semantics to the
jnp path's masked-update-then-reapply-bc sequence.

All kernels assume a radius-1 star stencil with per-level *constant*
coefficients (uniform grids; the reference's constant-coefficient hot
path) and run on the dense single-chip layout.  The jnp implementations
in ops/smoothers.py / ops/stencil_apply.py remain the always-correct
fallback for everything else.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _star_coefs(offsets, coefs, ndim: int):
    """Validate a radius-1 star stencil; return (c0, [(c_lo, c_hi)] per dim)
    as Python floats, or None if not representable."""
    c0 = None
    per_dim = [[0.0, 0.0] for _ in range(ndim)]
    for off, c in zip(offsets, coefs):
        try:
            c = float(c)
        except (TypeError, ValueError):
            return None
        nz = [d for d in range(ndim) if off[d] != 0]
        if not nz:
            c0 = c
        elif len(nz) == 1 and abs(off[nz[0]]) == 1:
            d = nz[0]
            per_dim[d][0 if off[d] < 0 else 1] += c
        else:
            return None  # diagonal entry -> not a star stencil
    if c0 is None or c0 == 0.0:
        return None
    return c0, [tuple(p) for p in per_dim]


def _apply_star_plane(a, b, c, cs):
    """A*u restricted to one z-plane: a/b/c are planes q-1/q/q+1 shaped
    (1, ny, nx); term order mirrors ops/stencil_apply.apply_stencil
    (center, then z-/z+/y-/y+/x-/x+) for FP parity with the jnp path."""
    c0, ((czm, czp), (cym, cyp), (cxm, cxp)) = cs
    out = c0 * b
    out = out + czm * a + czp * c
    out = out + cym * jnp.roll(b, 1, axis=1) + cyp * jnp.roll(b, -1, axis=1)
    out = out + cxm * jnp.roll(b, 1, axis=2) + cxp * jnp.roll(b, -1, axis=2)
    return out


# ======================================================================
# K-iteration fused RBGS smoother (the hot kernel)
# ======================================================================


def _rbgs_kernel(excl_ref, sol_ref, rhs_ref, out_ref, win, rwin,
                 *, nz, ny, nx, K, W, R, cs, omega):
    """One grid step p: ingest plane p into the revolving window, apply
    red-iteration-k at plane p-(2k-1) and black-iteration-k at p-2k for
    k=1..K (in place, wavefront order), and emit plane p-2K.  Plane
    ingestion/empission DMA is Pallas's automatic pipeline (double-
    buffered by the BlockSpec index maps in _build_rbgs_3d).

    `excl_ref` (SMEM int32[6]): per-dim lo/hi plane indices to EXCLUDE
    from updates, -1 for none — the sharded path runs this kernel on
    halo-extended fragment arrays where the physical Dirichlet boundary
    sits at an interior index (the dup plane), not at the array edge."""
    c0 = cs[0]
    scale = omega / c0
    p = pl.program_id(0)

    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    inner = inner & (iy != excl_ref[2]) & (iy != excl_ref[3]) \
        & (ix != excl_ref[4]) & (ix != excl_ref[5])
    par_yx = iy + ix

    @pl.when(p < nz)
    def _():
        win[pl.ds(p % W, 1)] = sol_ref[:]
        rwin[pl.ds(p % R, 1)] = rhs_ref[:]

    def update(q, color):
        s0 = q % W
        a = win[pl.ds((q - 1) % W, 1)]
        b = win[pl.ds(s0, 1)]
        c = win[pl.ds((q + 1) % W, 1)]
        f = rwin[pl.ds(q % R, 1)]
        corr = scale * (f - _apply_star_plane(a, b, c, cs))
        mask = inner & (((par_yx + q) % 2) == color)
        win[pl.ds(s0, 1)] = jnp.where(mask, b + corr, b)

    for lag in range(1, 2 * K + 1):
        q = p - lag
        color = 0 if (lag % 2 == 1) else 1

        @pl.when((q >= 1) & (q <= nz - 2)
                 & (q != excl_ref[0]) & (q != excl_ref[1]))
        def _(q=q, color=color):
            update(q, color)

    # emit plane p-2K (final after black-K above); for p-2K <= 0 and at the
    # tail the clamped output index map re-emits boundary planes unchanged
    qo = jnp.clip(p - 2 * K, 0, nz - 1)
    out_ref[:] = win[pl.ds(qo % W, 1)]


@functools.lru_cache(maxsize=64)
def _build_rbgs_3d(nz, ny, nx, K, cs_key, omega, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    W, R = 2 * K + 3, 2 * K + 2
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(
        _rbgs_kernel, nz=nz, ny=ny, nx=nx, K=K, W=W, R=R, cs=cs, omega=omega
    )
    plane_bytes = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 10) * plane_bytes
    call = pl.pallas_call(
        kernel,
        grid=(nz + 2 * K,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # excl planes (6,)
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ny, nx), lambda p: (jnp.clip(p - 2 * K, 0, nz - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((W, ny, nx), dtype),
            pltpu.VMEM((R, ny, nx), dtype),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem * 1.5 + (1 << 20), 127 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * 2 * 14 * nz * ny * nx,
            bytes_accessed=3 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pair_schedule() -> bool:
    """Pair-stepped (v2) kernels are the default; EXA_STREAM_V1=1 forces
    the single-plane v1 schedule (kept for the perf A/B table)."""
    import os

    return os.environ.get("EXA_STREAM_V1", "0") != "1"


def rbgs_fused_3d(sol, rhs, offsets, coefs, omega: float, n_iters: int,
                  interpret: bool = False, excl=None):
    """n_iters full RBGS iterations (red+black, global parity coloring,
    Dirichlet boundary preserved) on a dense (nz, ny, nx) array.

    `excl` (int32[6] or None): additional per-dim lo/hi plane indices to
    exclude from updates — the sharded fragment path protects its
    physical-boundary (dup) planes this way while updating the wide
    halo zone (-1 entries are inert)."""
    cs = _star_coefs(offsets, coefs, 3)
    if cs is None:
        raise ValueError("not a constant radius-1 star stencil")
    nz, ny, nx = sol.shape
    cs_key = (cs[0],) + tuple(cs[1])
    if excl is None:
        excl = jnp.full((6,), -1, jnp.int32)
    else:
        excl = jnp.asarray(excl, jnp.int32)
    k_max = _max_k(ny, nx, sol.dtype.itemsize)
    pair = _pair_schedule()
    left = n_iters
    while left > 0:
        K = min(left, k_max)
        if pair:
            from exastencils_tpu.ops.pallas.stream3d_pair import rbgs_fused_3d_p2

            sol = rbgs_fused_3d_p2(sol, rhs, cs_key, float(omega), K,
                                   excl, interpret)
        else:
            fn = _build_rbgs_3d(nz, ny, nx, K, cs_key, float(omega),
                                str(sol.dtype), interpret)
            sol = fn(excl, sol, rhs)
        left -= K
    return sol


def _max_k(ny, nx, itemsize, budget_bytes: int = 100 * 1024 * 1024) -> int:
    """Largest temporal-blocking depth whose VMEM window fits the budget."""
    plane = ny * _round_up(nx, 128) * itemsize
    k = 1
    while (4 * (k + 1) + 5 + 6) * plane <= budget_bytes and k < 8:
        k += 1
    return k


def pallas_applicable_3d(shape, offsets, coefs) -> bool:
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    if nz < 5 or ny < 3 or nx < 3:
        return False
    if _star_coefs(offsets, coefs, 3) is None:
        return False
    # window for K=1 must fit VMEM
    plane = ny * _round_up(nx, 128) * 4
    return 15 * plane <= 100 * 1024 * 1024


# ======================================================================
# fused residual + restriction (down-leg) and prolongation + correction
# (up-leg).  Both stream z-planes through the automatic BlockSpec
# pipeline and do the y/x transfer as MXU contractions per plane; the
# z transfer is a small ring-buffer accumulation.  One pass over the
# fine arrays replaces the unfused residual-write + residual-read of
# the XLA path (the down/up legs are pure-bandwidth ops).
# ======================================================================


def _down_kernel(sol_ref, rhs_ref, ry_ref, rx_ref, out_ref, win, rwin, resw,
                 *, nz, ny, nx, nzc, nyc, nxc, cs, wz, lo_z):
    """coarse_rhs[cz] = sum_k wz[k] * Ry @ residual[2*cz + lo_z + k] @ Rx^T
    with residual = rhs - A*sol computed on the fly (zero on boundary
    planes: Dirichlet residual bc, reference gen_residual bc = 0.0).

    Step p ingests fine plane p, forms the residual of plane p-1 and its
    y/x restriction into a 4-deep ring, and (re)writes the coarse plane
    the output index map points at — by the time the map moves off a
    coarse plane, all of its z-contributions are in the ring."""
    p = pl.program_id(0)
    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    nw = len(wz)

    @pl.when(p < nz)
    def _():
        win[pl.ds(p % 3, 1)] = sol_ref[:]
        rwin[pl.ds(p % 3, 1)] = rhs_ref[:]

    q = p - 1

    @pl.when((q >= 1) & (q <= nz - 2))
    def _():
        a = win[pl.ds((q - 1) % 3, 1)]
        b = win[pl.ds(q % 3, 1)]
        c = win[pl.ds((q + 1) % 3, 1)]
        f = rwin[pl.ds(q % 3, 1)]
        r = jnp.where(inner, f - _apply_star_plane(a, b, c, cs), 0.0)
        r2 = r.reshape(ny, nx)
        t = jnp.dot(ry_ref[:], r2, preferred_element_type=r2.dtype)
        rc = jnp.dot(t, rx_ref[:].T, preferred_element_type=r2.dtype)
        resw[pl.ds(q % 4, 1)] = rc.reshape(1, nyc, nxc)

    @pl.when((q == 0) | (q == nz - 1))
    def _():
        resw[pl.ds(q % 4, 1)] = jnp.zeros((1, nyc, nxc), resw.dtype)

    # (re)write the mapped coarse plane from the ring (matches the out
    # BlockSpec index map exactly)
    czi = jnp.clip((p - 3 - lo_z) // 2, 0, nzc - 1)
    total = jnp.zeros((1, nyc, nxc), out_ref.dtype)
    for k in range(nw):
        qk = 2 * czi + lo_z + k
        valid = (qk >= 0) & (qk <= nz - 1) & (qk >= p - 4) & (qk <= p - 1)
        total = total + jnp.where(valid, wz[k] * resw[pl.ds(qk % 4, 1)], 0.0)
    out_ref[:] = total


@functools.lru_cache(maxsize=64)
def _build_down_3d(nz, ny, nx, nzc, nyc, nxc, cs_key, wz, lo_z,
                   dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(
        _down_kernel, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc, nxc=nxc,
        cs=cs, wz=wz, lo_z=lo_z,
    )
    call = pl.pallas_call(
        kernel,
        grid=(nz + 2,),
        out_shape=jax.ShapeDtypeStruct((nzc, nyc, nxc), dtype),
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nyc, ny), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nxc, nx), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nyc, nxc),
            lambda p: (jnp.clip((p - 3 - lo_z) // 2, 0, nzc - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, ny, nx), dtype),
            pltpu.VMEM((3, ny, nx), dtype),
            pltpu.VMEM((4, nyc, nxc), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_transfer_vmem(ny, nx, nyc, nxc, dtype.itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (7 + nyc + nxc) * nz * ny * nx,
            bytes_accessed=(2 * nz * ny * nx + nzc * nyc * nxc) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def _transfer_vmem(ny, nx, nyc, nxc, itemsize) -> int:
    """Scoped-VMEM budget for the streaming transfer kernels: window
    planes + double-buffered IO blocks + transfer matrices + headroom."""
    fine_plane = ny * _round_up(nx, 128) * itemsize
    coarse_plane = nyc * _round_up(nxc, 128) * itemsize
    mats = (nyc * _round_up(nx, 128) + nxc * _round_up(nx, 128)
            + ny * _round_up(nxc, 128) + nx * _round_up(nxc, 128)) * itemsize
    need = 12 * fine_plane + 10 * coarse_plane + 2 * mats + (4 << 20)
    return int(min(need, 127 * 1024 * 1024))


def res_restrict_fused_3d(sol, rhs, offsets, coefs, ry, rx, wz, lo_z,
                          coarse_shape, interpret: bool = False):
    """Fused residual + full-weighting restriction on the dense 3D path:
    one streaming pass over sol/rhs emits the coarse rhs directly."""
    cs = _star_coefs(offsets, coefs, 3)
    if cs is None:
        raise ValueError("not a constant radius-1 star stencil")
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = coarse_shape
    fn = _build_down_3d(nz, ny, nx, nzc, nyc, nxc,
                        (cs[0],) + tuple(cs[1]), tuple(wz), int(lo_z),
                        str(sol.dtype), interpret)
    return fn(sol, rhs, ry, rx)


def _up_kernel(sol_ref, cL_ref, cH_ref, py_ref, px_ref, out_ref,
               *, nz, ny, nx, nzc, nyc, nxc, wz, lo_z):
    """sol[f] += (P_z P_y P_x coarse)[f] on inner nodes.  Fine plane f
    draws from at most two coarse planes czH = (f - lo_z) // 2 and
    czL = czH - 1 (whichever k with f = 2*cz + lo_z + k are integral);
    both are supplied by clamped input index maps."""
    f = pl.program_id(0)
    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    nw = len(wz)
    czH = (f - lo_z) // 2
    czL = czH - 1
    dtype = out_ref.dtype
    wH = jnp.zeros((), dtype)
    wL = jnp.zeros((), dtype)
    for k in range(nw):
        num = f - lo_z - k
        cz = num // 2
        ok = (num % 2 == 0) & (cz >= 0) & (cz <= nzc - 1)
        wH = wH + jnp.where(ok & (cz == czH), wz[k], 0.0).astype(dtype)
        wL = wL + jnp.where(ok & (cz == czL), wz[k], 0.0).astype(dtype)

    def prolong_plane(cref):
        cpl = cref[:].reshape(nyc, nxc)
        t = jnp.dot(py_ref[:], cpl, preferred_element_type=cpl.dtype)
        return jnp.dot(t, px_ref[:].T, preferred_element_type=cpl.dtype
                       ).reshape(1, ny, nx)

    corr = wH * prolong_plane(cH_ref) + wL * prolong_plane(cL_ref)
    s = sol_ref[:]
    write = inner & (f >= 1) & (f <= nz - 2)
    out_ref[:] = jnp.where(write, s + corr, s)


@functools.lru_cache(maxsize=64)
def _build_up_3d(nz, ny, nx, nzc, nyc, nxc, wz, lo_z, dtype_str, interpret):
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(
        _up_kernel, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc, nxc=nxc,
        wz=wz, lo_z=lo_z,
    )
    call = pl.pallas_call(
        kernel,
        grid=(nz,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda f: (f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda f: (jnp.clip((f - lo_z) // 2 - 1, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda f: (jnp.clip((f - lo_z) // 2, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nyc), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nxc), lambda f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ny, nx), lambda f: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_transfer_vmem(ny, nx, nyc, nxc, dtype.itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (nyc + nxc) * nz * ny * nx // max(1, nx),
            bytes_accessed=(2 * nz * ny * nx + 2 * nzc * nyc * nxc) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def prolong_correct_fused_3d(sol, sol_c, py, px, wz, lo_z,
                             interpret: bool = False):
    """Fused prolongation + correction: sol_new = sol + P sol_c on inner
    nodes, one streaming pass (boundary/Dirichlet planes untouched)."""
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = sol_c.shape
    fn = _build_up_3d(nz, ny, nx, nzc, nyc, nxc, tuple(wz), int(lo_z),
                      str(sol.dtype), interpret)
    # sol_c feeds two block streams (the lo/hi contributing coarse planes)
    return fn(sol, sol_c, sol_c, py, px)


# ======================================================================
# whole-leg fusion: the ENTIRE down leg (K pre-smoothing iterations +
# residual + restriction) and the ENTIRE up leg (prolongation +
# correction + K post-smoothing iterations) each as ONE streaming pass.
# Per level visit the cycle then moves 3+1/8 arrays down and 3+1/8 up —
# the V-cycle's true HBM speed of light.
# ======================================================================


def _smooth_down_kernel(sol_ref, rhs_ref, ry_ref, rx_ref, out_ref, outc_ref,
                        win, rwin, resw,
                        *, nz, ny, nx, nzc, nyc, nxc, K, W, R, cs, omega,
                        wz, lo_z):
    """rbgs wavefront (K iterations) + residual of the fully-smoothed
    plane p-2K-1 + its y/x restriction + z-combine into coarse planes.
    Residual of plane q is formed once planes q-1..q+1 carry black-K."""
    c0 = cs[0]
    scale = omega / c0
    p = pl.program_id(0)
    nw = len(wz)

    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    par_yx = iy + ix

    @pl.when(p < nz)
    def _():
        win[pl.ds(p % W, 1)] = sol_ref[:]
        rwin[pl.ds(p % R, 1)] = rhs_ref[:]

    def update(q, color):
        s0 = q % W
        a = win[pl.ds((q - 1) % W, 1)]
        b = win[pl.ds(s0, 1)]
        c = win[pl.ds((q + 1) % W, 1)]
        f = rwin[pl.ds(q % R, 1)]
        corr = scale * (f - _apply_star_plane(a, b, c, cs))
        mask = inner & (((par_yx + q) % 2) == color)
        win[pl.ds(s0, 1)] = jnp.where(mask, b + corr, b)

    for lag in range(1, 2 * K + 1):
        q = p - lag
        color = 0 if (lag % 2 == 1) else 1

        @pl.when((q >= 1) & (q <= nz - 2))
        def _(q=q, color=color):
            update(q, color)

    # residual + y/x restriction of the fully-smoothed plane q
    q = p - 2 * K - 1

    @pl.when((q >= 1) & (q <= nz - 2))
    def _():
        a = win[pl.ds((q - 1) % W, 1)]
        b = win[pl.ds(q % W, 1)]
        c = win[pl.ds((q + 1) % W, 1)]
        f = rwin[pl.ds(q % R, 1)]
        r = jnp.where(inner, f - _apply_star_plane(a, b, c, cs), 0.0)
        r2 = r.reshape(ny, nx)
        t = jnp.dot(ry_ref[:], r2, preferred_element_type=r2.dtype)
        rc = jnp.dot(t, rx_ref[:].T, preferred_element_type=r2.dtype)
        resw[pl.ds(q % 4, 1)] = rc.reshape(1, nyc, nxc)

    @pl.when((q == 0) | (q == nz - 1))
    def _():
        resw[pl.ds(q % 4, 1)] = jnp.zeros((1, nyc, nxc), resw.dtype)

    # emit smoothed fine plane p-2K (matches out index map)
    qo = jnp.clip(p - 2 * K, 0, nz - 1)
    out_ref[:] = win[pl.ds(qo % W, 1)]

    # (re)write the mapped coarse plane from the restriction ring
    czi = jnp.clip((p - 2 * K - 3 - lo_z) // 2, 0, nzc - 1)
    total = jnp.zeros((1, nyc, nxc), outc_ref.dtype)
    for k in range(nw):
        qk = 2 * czi + lo_z + k
        valid = (qk >= 0) & (qk <= nz - 1) & (qk >= p - 2 * K - 4) \
            & (qk <= p - 2 * K - 1)
        total = total + jnp.where(valid, wz[k] * resw[pl.ds(qk % 4, 1)], 0.0)
    outc_ref[:] = total


@functools.lru_cache(maxsize=64)
def _build_smooth_down_3d(nz, ny, nx, nzc, nyc, nxc, K, cs_key, omega,
                          wz, lo_z, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    W, R = 2 * K + 3, 2 * K + 2
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(
        _smooth_down_kernel, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc, nxc=nxc,
        K=K, W=W, R=R, cs=cs, omega=omega, wz=wz, lo_z=lo_z,
    )
    plane = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 12) * plane + 8 * nyc * _round_up(nxc, 128) * dtype.itemsize
    call = pl.pallas_call(
        kernel,
        grid=(nz + 2 * K + 2,),
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nx), dtype),
            jax.ShapeDtypeStruct((nzc, nyc, nxc), dtype),
        ],
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nyc, ny), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nxc, nx), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ny, nx),
                         lambda p: (jnp.clip(p - 2 * K, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda p: (jnp.clip((p - 2 * K - 3 - lo_z) // 2, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, ny, nx), dtype),
            pltpu.VMEM((R, ny, nx), dtype),
            pltpu.VMEM((4, nyc, nxc), dtype),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem * 1.3 + (4 << 20), 127 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(K * 2 + 1) * 14 * nz * ny * nx + 2 * (nyc + nxc) * nz * ny * nx // 2,
            bytes_accessed=(3 * nz * ny * nx + nzc * nyc * nxc) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def smooth_res_restrict_fused_3d(sol, rhs, offsets, coefs, omega, n_iters,
                                 ry, rx, wz, lo_z, coarse_shape,
                                 interpret: bool = False):
    """K=n_iters RBGS iterations + residual + restriction in ONE pass:
    returns (smoothed sol, coarse rhs).  n_iters must fit the VMEM
    window (callers check via max_fused_k_3d)."""
    cs = _star_coefs(offsets, coefs, 3)
    if cs is None:
        raise ValueError("not a constant radius-1 star stencil")
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = coarse_shape
    if _pair_schedule():
        from exastencils_tpu.ops.pallas.stream3d_pair import (
            smooth_res_restrict_fused_3d_p2,
        )

        excl = jnp.full((6,), -1, jnp.int32)
        return smooth_res_restrict_fused_3d_p2(
            sol, rhs, (cs[0],) + tuple(cs[1]), float(omega), int(n_iters),
            ry, rx, wz, lo_z, tuple(coarse_shape), excl, interpret)
    fn = _build_smooth_down_3d(nz, ny, nx, nzc, nyc, nxc, int(n_iters),
                               (cs[0],) + tuple(cs[1]), float(omega),
                               tuple(wz), int(lo_z), str(sol.dtype), interpret)
    return fn(sol, rhs, ry, rx)


def _up_smooth_kernel(sol_ref, rhs_ref, cL_ref, cH_ref, py_ref, px_ref,
                      out_ref, win, rwin,
                      *, nz, ny, nx, nzc, nyc, nxc, K, W, R, cs, omega,
                      wz, lo_z):
    """Ingest plane p as sol + prolonged correction, then the rbgs
    wavefront applies K post-smoothing iterations behind the ingest
    front; plane p-2K is emitted fully smoothed."""
    c0 = cs[0]
    scale = omega / c0
    p = pl.program_id(0)
    nw = len(wz)
    dtype = out_ref.dtype

    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    par_yx = iy + ix

    @pl.when(p < nz)
    def _():
        czH = (p - lo_z) // 2
        czL = czH - 1
        wH = jnp.zeros((), dtype)
        wL = jnp.zeros((), dtype)
        for k in range(nw):
            num = p - lo_z - k
            cz = num // 2
            ok = (num % 2 == 0) & (cz >= 0) & (cz <= nzc - 1)
            wH = wH + jnp.where(ok & (cz == czH), wz[k], 0.0).astype(dtype)
            wL = wL + jnp.where(ok & (cz == czL), wz[k], 0.0).astype(dtype)

        def prolong_plane(cref):
            cpl = cref[:].reshape(nyc, nxc)
            t = jnp.dot(py_ref[:], cpl, preferred_element_type=cpl.dtype)
            return jnp.dot(t, px_ref[:].T, preferred_element_type=cpl.dtype
                           ).reshape(1, ny, nx)

        corr = wH * prolong_plane(cH_ref) + wL * prolong_plane(cL_ref)
        s = sol_ref[:]
        write = inner & (p >= 1) & (p <= nz - 2)
        win[pl.ds(p % W, 1)] = jnp.where(write, s + corr, s)
        rwin[pl.ds(p % R, 1)] = rhs_ref[:]

    def update(q, color):
        s0 = q % W
        a = win[pl.ds((q - 1) % W, 1)]
        b = win[pl.ds(s0, 1)]
        c = win[pl.ds((q + 1) % W, 1)]
        f = rwin[pl.ds(q % R, 1)]
        corr = scale * (f - _apply_star_plane(a, b, c, cs))
        mask = inner & (((par_yx + q) % 2) == color)
        win[pl.ds(s0, 1)] = jnp.where(mask, b + corr, b)

    for lag in range(1, 2 * K + 1):
        q = p - lag
        color = 0 if (lag % 2 == 1) else 1

        @pl.when((q >= 1) & (q <= nz - 2))
        def _(q=q, color=color):
            update(q, color)

    qo = jnp.clip(p - 2 * K, 0, nz - 1)
    out_ref[:] = win[pl.ds(qo % W, 1)]


@functools.lru_cache(maxsize=64)
def _build_up_smooth_3d(nz, ny, nx, nzc, nyc, nxc, K, cs_key, omega,
                        wz, lo_z, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    W, R = 2 * K + 3, 2 * K + 2
    dtype = jnp.dtype(dtype_str)
    kernel = functools.partial(
        _up_smooth_kernel, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc, nxc=nxc,
        K=K, W=W, R=R, cs=cs, omega=omega, wz=wz, lo_z=lo_z,
    )
    plane = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 12) * plane + 8 * nyc * _round_up(nxc, 128) * dtype.itemsize
    call = pl.pallas_call(
        kernel,
        grid=(nz + 2 * K,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny, nx), lambda p: (jnp.clip(p, 0, nz - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda p: (jnp.clip((p - lo_z) // 2 - 1, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda p: (jnp.clip((p - lo_z) // 2, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nyc), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nxc), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ny, nx), lambda p: (jnp.clip(p - 2 * K, 0, nz - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((W, ny, nx), dtype),
            pltpu.VMEM((R, ny, nx), dtype),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem * 1.3 + (4 << 20), 127 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(K * 2 + 1) * 14 * nz * ny * nx,
            bytes_accessed=(3 * nz * ny * nx + 2 * nzc * nyc * nxc) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def prolong_correct_smooth_fused_3d(sol, sol_c, rhs, offsets, coefs, omega,
                                    n_iters, py, px, wz, lo_z,
                                    interpret: bool = False):
    """Prolongation + correction + K=n_iters RBGS post-smoothing
    iterations in ONE pass over sol/rhs."""
    cs = _star_coefs(offsets, coefs, 3)
    if cs is None:
        raise ValueError("not a constant radius-1 star stencil")
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = sol_c.shape
    if _pair_schedule():
        from exastencils_tpu.ops.pallas.stream3d_pair import (
            prolong_correct_smooth_fused_3d_p2,
        )

        excl = jnp.full((6,), -1, jnp.int32)
        return prolong_correct_smooth_fused_3d_p2(
            sol, sol_c, rhs, (cs[0],) + tuple(cs[1]), float(omega),
            int(n_iters), py, px, wz, lo_z, excl, interpret)
    fn = _build_up_smooth_3d(nz, ny, nx, nzc, nyc, nxc, int(n_iters),
                             (cs[0],) + tuple(cs[1]), float(omega),
                             tuple(wz), int(lo_z), str(sol.dtype), interpret)
    return fn(sol, rhs, sol_c, sol_c, py, px)


def max_fused_k_3d(ny, nx, itemsize) -> int:
    """Largest K whose whole-leg VMEM window fits (same budget as the
    fused smoother)."""
    return _max_k(ny, nx, itemsize)
