"""Plane-PAIR streaming kernels (v2 schedule) for 3D star-stencil multigrid.

Same arithmetic, same FP op order as the v1 kernels in stream3d.py
(parity-held to 1e-12 against the jnp path); the restructure is pure
scheduling, executing the round-4 perf audit's lever 2
(runtime/performance.py:112-147 "two z-planes per grid step"):

  - each grid step ingests/emits TWO z-planes, halving the grid-step
    count and amortizing per-step fixed cost (mask construction, emit
    copies, pipeline bookkeeping) over twice the work;
  - with plane indices 2g+s-lag, the red/black parity of every update
    is STATIC, so the per-update parity arithmetic of v1 (iota add +
    mod + compare + and, ~5 VPU ops of ~20 per point) disappears: two
    precomputed (inner & parity) masks are selected at trace time;
  - the up leg prolongs each coarse plane ONCE into a VMEM ring
    (v1 re-prolonged per fine plane: 2 matmul pairs per fine plane;
    v2: 1 per 2 fine planes — half the MXU work).

Reference analog: CUDA_Kernel block-size choice + IR_ContractingLoop
temporal blocking (parallelization/api/cuda/CUDA_Kernel.scala:53-85,
baseExt/ir/IR_ContractingLoop.scala:43).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exastencils_tpu.ops.pallas.stream3d import (
    _apply_star_plane,
    _round_up,
    _star_coefs,
    _transfer_vmem,
)


def _pair_masks(ny, nx, excl_ref):
    """inner-point masks split by (iy+ix) parity, with the sharded
    path's per-dim exclusion planes folded in.  Computed once per grid
    step; every update selects one of the two at TRACE time."""
    iy = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
    inner = (iy >= 1) & (iy <= ny - 2) & (ix >= 1) & (ix <= nx - 2)
    inner = inner & (iy != excl_ref[2]) & (iy != excl_ref[3]) \
        & (ix != excl_ref[4]) & (ix != excl_ref[5])
    par = (iy + ix) % 2
    return (inner & (par == 0), inner & (par == 1))


def _make_update(win, rwin, W, R, cs, scale):
    """One masked half-sweep update of window plane q (identical math
    and FP order to v1's update closure)."""

    def update(q, mask):
        s0 = q % W
        a = win[pl.ds((q - 1) % W, 1)]
        b = win[pl.ds(s0, 1)]
        c = win[pl.ds((q + 1) % W, 1)]
        f = rwin[pl.ds(q % R, 1)]
        corr = scale * (f - _apply_star_plane(a, b, c, cs))
        win[pl.ds(s0, 1)] = jnp.where(mask, b + corr, b)

    return update


def _wavefront_pair(update, masks, excl_ref, g, nz, K):
    """Run the two virtual single-plane steps p=2g and p=2g+1: for each,
    red-iteration-k at plane p-(2k-1), black-iteration-k at p-2k.
    Parity of plane 2g+s-lag with color c selects masks[(c+lag+s) % 2]
    statically ((iy+ix+q) % 2 == c  <=>  (iy+ix) % 2 == (c+q) % 2)."""
    for s in range(2):
        p = 2 * g + s
        for lag in range(1, 2 * K + 1):
            q = p - lag
            color = 0 if (lag % 2 == 1) else 1
            mask = masks[(color + lag + s) % 2]

            @pl.when((q >= 1) & (q <= nz - 2)
                     & (q != excl_ref[0]) & (q != excl_ref[1]))
            def _(q=q, mask=mask):
                update(q, mask)


# ======================================================================
# K-iteration fused RBGS smoother, pair-stepped
# ======================================================================


def _rbgs_kernel_p2(excl_ref, sol_ref, rhs_ref, out_ref, win, rwin,
                    *, nz, ny, nx, K, W, R, cs, omega):
    c0 = cs[0]
    scale = omega / c0
    g = pl.program_id(0)
    masks = _pair_masks(ny, nx, excl_ref)

    for s in range(2):
        p = 2 * g + s

        @pl.when(p < nz)
        def _(p=p, s=s):
            win[pl.ds(p % W, 1)] = sol_ref[pl.ds(s, 1)]
            rwin[pl.ds(p % R, 1)] = rhs_ref[pl.ds(s, 1)]

    update = _make_update(win, rwin, W, R, cs, scale)
    _wavefront_pair(update, masks, excl_ref, g, nz, K)

    # emit pair g-K = planes (2(g-K), 2(g-K)+1); the clamped output map
    # re-emits edge pairs unchanged at head/tail (out-of-range sub-plane
    # writes of the overhang block are masked by Pallas)
    for s in range(2):
        qo = jnp.clip(2 * (g - K) + s, 0, nz - 1)
        out_ref[pl.ds(s, 1)] = win[pl.ds(qo % W, 1)]


@functools.lru_cache(maxsize=64)
def _build_rbgs_3d_p2(nz, ny, nx, K, cs_key, omega, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    W, R = 2 * K + 3, 2 * K + 2
    dtype = jnp.dtype(dtype_str)
    nP = (nz + 1) // 2
    kernel = functools.partial(
        _rbgs_kernel_p2, nz=nz, ny=ny, nx=nx, K=K, W=W, R=R, cs=cs,
        omega=omega,
    )
    plane_bytes = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 18) * plane_bytes
    call = pl.pallas_call(
        kernel,
        grid=(nP + K,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # excl planes (6,)
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, ny, nx), lambda g: (jnp.clip(g - K, 0, nP - 1), 0, 0),
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


def rbgs_fused_3d_p2(sol, rhs, cs_key, omega, K, excl, interpret):
    nz, ny, nx = sol.shape
    fn = _build_rbgs_3d_p2(nz, ny, nx, K, cs_key, float(omega),
                           str(sol.dtype), interpret)
    return fn(excl, sol, rhs)


# ======================================================================
# whole down leg (K pre-smooth + residual + restriction), pair-stepped
# ======================================================================


def _smooth_down_kernel_p2(excl_ref, sol_ref, rhs_ref, ry_ref, rx_ref,
                           out_ref, outc_ref, win, rwin, resw,
                           *, nz, ny, nx, nzc, nyc, nxc, K, W, R, cs,
                           omega, wz, lo_z):
    c0 = cs[0]
    scale = omega / c0
    g = pl.program_id(0)
    nw = len(wz)
    masks = _pair_masks(ny, nx, excl_ref)
    inner = masks[0] | masks[1]

    for s in range(2):
        p = 2 * g + s

        @pl.when(p < nz)
        def _(p=p, s=s):
            win[pl.ds(p % W, 1)] = sol_ref[pl.ds(s, 1)]
            rwin[pl.ds(p % R, 1)] = rhs_ref[pl.ds(s, 1)]

    update = _make_update(win, rwin, W, R, cs, scale)
    _wavefront_pair(update, masks, excl_ref, g, nz, K)

    # residual + y/x restriction of the two fully-smoothed planes
    # q = 2g-2K-1 and 2g-2K into a 4-deep ring.  Residual is ZERO on
    # physical-boundary planes (gen_residual bc = 0.0): densely those
    # are the array edges; on a shard the physical z-boundary sits at
    # the interior dup planes excl[0]/excl[1].
    for s in range(2):
        q = 2 * g + s - 2 * K - 1
        z_bc = (q == 0) | (q == nz - 1) \
            | (q == excl_ref[0]) | (q == excl_ref[1])

        @pl.when((q >= 1) & (q <= nz - 2) & jnp.logical_not(z_bc))
        def _(q=q):
            a = win[pl.ds((q - 1) % W, 1)]
            b = win[pl.ds(q % W, 1)]
            c = win[pl.ds((q + 1) % W, 1)]
            f = rwin[pl.ds(q % R, 1)]
            r = jnp.where(inner, f - _apply_star_plane(a, b, c, cs), 0.0)
            r2 = r.reshape(ny, nx)
            t = jnp.dot(ry_ref[:], r2, preferred_element_type=r2.dtype)
            rc = jnp.dot(t, rx_ref[:].T, preferred_element_type=r2.dtype)
            resw[pl.ds(q % 4, 1)] = rc.reshape(1, nyc, nxc)

        @pl.when(((q >= 0) & (q <= nz - 1)) & z_bc)
        def _(q=q):
            resw[pl.ds(q % 4, 1)] = jnp.zeros((1, nyc, nxc), resw.dtype)

    # emit smoothed fine pair g-K
    for s in range(2):
        qo = jnp.clip(2 * (g - K) + s, 0, nz - 1)
        out_ref[pl.ds(s, 1)] = win[pl.ds(qo % W, 1)]

    # one coarse plane per step: czi is the newest coarse plane whose
    # last z-tap (2*czi+lo_z+nw-1) is <= the newest residual q1 = 2g-2K.
    # Tail steps whose clamped czi taps have already left the 4-deep ring
    # skip the write, preserving the completed plane in the out buffer.
    q1 = 2 * g - 2 * K
    czi = jnp.clip((q1 - lo_z - nw + 1) // 2, 0, nzc - 1)

    @pl.when(2 * czi + lo_z >= q1 - 3)
    def _():
        total = jnp.zeros((1, nyc, nxc), outc_ref.dtype)
        for k in range(nw):
            qk = 2 * czi + lo_z + k
            valid = (qk >= 0) & (qk <= nz - 1) & (qk >= q1 - 3) & (qk <= q1)
            total_k = jnp.where(valid, wz[k] * resw[pl.ds(qk % 4, 1)], 0.0)
            total = total + total_k
        outc_ref[:] = total


@functools.lru_cache(maxsize=64)
def _build_smooth_down_3d_p2(nz, ny, nx, nzc, nyc, nxc, K, cs_key, omega,
                             wz, lo_z, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    # one plane deeper than the rbgs window: the residual of the OLDER
    # sub-plane (q = 2g-2K-1) reads window plane q-1 = 2g-2K-2 after the
    # step's ingest front has advanced to 2g+1
    W, R = 2 * K + 4, 2 * K + 3
    dtype = jnp.dtype(dtype_str)
    nP = (nz + 1) // 2
    nw = len(wz)
    kernel = functools.partial(
        _smooth_down_kernel_p2, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc,
        nxc=nxc, K=K, W=W, R=R, cs=cs, omega=omega, wz=wz, lo_z=lo_z,
    )
    plane = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 20) * plane + 8 * nyc * _round_up(nxc, 128) * dtype.itemsize
    call = pl.pallas_call(
        kernel,
        grid=(nP + K + 2,),
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, nx), dtype),
            jax.ShapeDtypeStruct((nzc, nyc, nxc), dtype),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # excl planes (6,)
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nyc, ny), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nxc, nx), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, ny, nx),
                         lambda g: (jnp.clip(g - K, 0, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, nyc, nxc),
                lambda g: (jnp.clip((2 * g - 2 * K - lo_z - nw + 1) // 2,
                                    0, nzc - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, ny, nx), dtype),
            pltpu.VMEM((R, ny, nx), dtype),
            pltpu.VMEM((4, nyc, nxc), dtype),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem * 1.3 + (4 << 20), 127 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(K * 2 + 1) * 14 * nz * ny * nx
            + 2 * (nyc + nxc) * nz * ny * nx // 2,
            bytes_accessed=(3 * nz * ny * nx + nzc * nyc * nxc) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def smooth_res_restrict_fused_3d_p2(sol, rhs, cs_key, omega, K, ry, rx,
                                    wz, lo_z, coarse_shape, excl, interpret):
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = coarse_shape
    fn = _build_smooth_down_3d_p2(nz, ny, nx, nzc, nyc, nxc, int(K),
                                  cs_key, float(omega), tuple(wz), int(lo_z),
                                  str(sol.dtype), interpret)
    return fn(excl, sol, rhs, ry, rx)


# ======================================================================
# whole up leg (prolong + correct + K post-smooth), pair-stepped with a
# once-per-coarse-plane prolongation ring
# ======================================================================


def _up_smooth_kernel_p2(excl_ref, sol_ref, rhs_ref, c0_ref, c1_ref,
                         py_ref, px_ref, out_ref, win, rwin, pring,
                         *, nz, ny, nx, nzc, nyc, nxc, K, W, R, cs,
                         omega, wz, lo_z, off):
    c0 = cs[0]
    scale = omega / c0
    g = pl.program_id(0)
    nw = len(wz)
    dtype = out_ref.dtype
    masks = _pair_masks(ny, nx, excl_ref)
    inner = masks[0] | masks[1]

    def prolong_into(slot, cref):
        cpl = cref[:].reshape(nyc, nxc)
        t = jnp.dot(py_ref[:], cpl, preferred_element_type=cpl.dtype)
        pring[pl.ds(slot, 1)] = jnp.dot(
            t, px_ref[:].T, preferred_element_type=cpl.dtype
        ).reshape(1, ny, nx)

    # the newest coarse plane needed at step g is czN = g + off with
    # off = (1 - lo_z)//2 (czH of sub-plane p=2g+1); the step range is
    # {czN-2 .. czN}, so a 3-slot ring keyed cz%3 suffices.
    # warm-up: plane czN(0)-1 = off-1 into its slot; the (off-2) slot
    # position (the never-used lowest read at g=0) zeroed so the
    # weight-0 product below stays finite
    @pl.when(g == 0)
    def _():
        pring[pl.ds((off - 2) % 3, 1)] = jnp.zeros((1, ny, nx), dtype)
        prolong_into((off - 1) % 3, c0_ref)

    # every step: newest coarse plane min(g+off, nzc-1) into slot
    # (g+off)%3 (for g+off > nzc-1 this re-prolongs the clamped top
    # plane into a slot no in-range read maps to; its weights are zeroed
    # by the ok-checks)
    prolong_into((g + off) % 3, c1_ref)

    for s in range(2):
        p = 2 * g + s

        @pl.when(p < nz)
        def _(p=p, s=s):
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
            corr = wH * pring[pl.ds(czH % 3, 1)] + wL * pring[pl.ds(czL % 3, 1)]
            sline = sol_ref[pl.ds(s, 1)]
            # no correction on physical-boundary planes (Dirichlet):
            # densely the array edges; on a shard also the dup planes
            # excl[0]/excl[1]
            write = inner & (p >= 1) & (p <= nz - 2) \
                & (p != excl_ref[0]) & (p != excl_ref[1])
            win[pl.ds(p % W, 1)] = jnp.where(write, sline + corr, sline)
            rwin[pl.ds(p % R, 1)] = rhs_ref[pl.ds(s, 1)]

    update = _make_update(win, rwin, W, R, cs, scale)
    _wavefront_pair(update, masks, excl_ref, g, nz, K)

    for s in range(2):
        qo = jnp.clip(2 * (g - K) + s, 0, nz - 1)
        out_ref[pl.ds(s, 1)] = win[pl.ds(qo % W, 1)]


@functools.lru_cache(maxsize=64)
def _build_up_smooth_3d_p2(nz, ny, nx, nzc, nyc, nxc, K, cs_key, omega,
                           wz, lo_z, dtype_str, interpret):
    cs = (cs_key[0], tuple(cs_key[1:]))
    W, R = 2 * K + 3, 2 * K + 2
    dtype = jnp.dtype(dtype_str)
    nP = (nz + 1) // 2
    off = (1 - lo_z) // 2  # newest coarse plane needed at step g is g+off
    kernel = functools.partial(
        _up_smooth_kernel_p2, nz=nz, ny=ny, nx=nx, nzc=nzc, nyc=nyc,
        nxc=nxc, K=K, W=W, R=R, cs=cs, omega=omega, wz=wz, lo_z=lo_z,
        off=off,
    )
    plane = ny * _round_up(nx, 128) * dtype.itemsize
    vmem = (W + R + 3 + 18) * plane \
        + 6 * nyc * _round_up(nxc, 128) * dtype.itemsize
    call = pl.pallas_call(
        kernel,
        grid=(nP + K,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # excl planes (6,)
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ny, nx), lambda g: (jnp.minimum(g, nP - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda g: (jnp.clip(g + off - 1, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyc, nxc),
                         lambda g: (jnp.clip(g + off, 0, nzc - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nyc), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nxc), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, ny, nx), lambda g: (jnp.clip(g - K, 0, nP - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((W, ny, nx), dtype),
            pltpu.VMEM((R, ny, nx), dtype),
            pltpu.VMEM((3, ny, nx), dtype),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem * 1.3 + (4 << 20), 127 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(K * 2 + 1) * 14 * nz * ny * nx,
            bytes_accessed=(3 * nz * ny * nx + 2 * nzc * nyc * nxc)
            * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=bool(interpret),
    )
    return jax.jit(call)


def prolong_correct_smooth_fused_3d_p2(sol, sol_c, rhs, cs_key, omega, K,
                                       py, px, wz, lo_z, excl, interpret):
    nz, ny, nx = sol.shape
    nzc, nyc, nxc = sol_c.shape
    fn = _build_up_smooth_3d_p2(nz, ny, nx, nzc, nyc, nxc, int(K), cs_key,
                                float(omega), tuple(wz), int(lo_z),
                                str(sol.dtype), interpret)
    return fn(excl, sol, rhs, sol_c, sol_c, py, px)
