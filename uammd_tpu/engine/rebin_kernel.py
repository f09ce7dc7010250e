"""Pallas TPU kernel: in-place cell rebinning of the grid-resident layout.

Replaces the two-variadic-sort rebin (layout.rebin, ~600 ms at 1M particles)
with a single "pull" kernel (~1-2 force-pass equivalents): each (z, y-block)
program examines its 3x3x3 cell neighborhood — particles move at most one
cell between rebins, guaranteed by the half-skin drift trigger (reference
analog: VerletListBase.cuh:56-70) — selects the candidates whose *current*
position falls in its cells, and compacts them into the CAP slots by
rank-select:

  rank(candidate) = exclusive prefix count of valid candidates in its
                    lane-cell (a strict-lower-triangular matmul on the MXU)
  out[r]          = sum_cand [rank == r] * value   (one-hot masked sums of
                    shape [CAP_out, CAP_src, NLANE] — the same VPU-friendly
                    block shape as the force kernel)

This is the TPU-native equivalent of the reference's hash-sort cell rebuild
(reference: src/Interactor/NeighbourList/CellList/CellListBase.cuh:124-230 +
utils/ParticleSorter.cuh:129): same result, but expressed as rolls + masked
sums instead of a global radix sort, because on TPU a global sort moves 44
bytes per element ~hundreds of times while this kernel touches each byte
about twice.

Quantities travel stacked as [Q, nz, nyb, CAP, NLANE] float32 with layout
(x, y, z, ..., pid+1): x/y/z first (cell assignment), pid-as-float last.
Positions are wrapped into the primary box on the way; empty slots get
layout.EMPTY_POS and pid -1. Lost particles (count mismatch) or cell
overflow latch the overflow flag for the host (reference error-flag idiom,
CellListBase.cuh:82-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import EMPTY_POS, GridSpec, GridState


def _shift_lanes(a, s, interpret):
    n = a.shape[-1]
    shift = (-s) % n
    if shift == 0:
        return a
    if interpret:
        return jnp.roll(a, shift, axis=-1)
    return pltpu.roll(a, shift, axis=a.ndim - 1)


def make_rebin_kernel(spec: GridSpec, n_q: int, *, interpret: bool | None = None):
    """Build rebin(stacked [Q, nz, nyb, CAP, NLANE]) ->
    (stacked_out, total_count, overflow_count)."""
    nx, ny, nz = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    Lx, Ly, Lz = (np.float32(s) for s in spec.box_size)
    fnx, fny, fnz = np.float32(nx), np.float32(ny), np.float32(nz)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    offsets = [(dz, dyb) for dz in (-1, 0, 1) for dyb in (-1, 0, 1)]

    def kernel(*refs):
        ins = refs[:9]
        out_ref, count_ref, ovf_ref = refs[9:]
        zpid = pl.program_id(0)
        ypid = pl.program_id(1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nlane), 1)
        my_cx = (lane // F).astype(jnp.float32)
        my_f = lane - (lane // F) * F
        my_cy = (ypid * F + my_f).astype(jnp.float32)
        my_cz = zpid.astype(jnp.float32)

        # strict lower-triangular matrix for exclusive prefix sums over
        # source sublanes (rank[s] = sum_{s'<s} valid[s'])
        r_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
        tri = (c_i < r_i).astype(jnp.float32)  # [cap_dst_s, cap_src_s]
        out_r = jax.lax.broadcasted_iota(jnp.int32, (cap, 1, 1), 0).astype(
            jnp.float32
        )

        # load + periodic-adjust the 9 neighbor blocks
        blocks = {}
        for k, (dz, dyb) in enumerate(offsets):
            blk = ins[k][:, 0, 0, :, :]  # [Q, cap, nlane]
            q_list = [blk[q] for q in range(n_q)]
            if dyb == 1:
                q_list[1] = q_list[1] + jnp.where(ypid == nyb - 1, Ly, 0.0)
            elif dyb == -1:
                q_list[1] = q_list[1] + jnp.where(ypid == 0, -Ly, 0.0)
            if dz == 1:
                q_list[2] = q_list[2] + jnp.where(zpid == nz - 1, Lz, 0.0)
            elif dz == -1:
                q_list[2] = q_list[2] + jnp.where(zpid == 0, -Lz, 0.0)
            blocks[(dz, dyb)] = q_list

        acc = [jnp.zeros((cap, nlane), jnp.float32) for _ in range(n_q)]
        filled = jnp.zeros((cap, nlane), jnp.float32)
        base_rank = jnp.zeros((1, nlane), jnp.float32)
        overflow = jnp.zeros((), jnp.float32)
        n_count = jnp.zeros((), jnp.float32)

        for dz in (-1, 0, 1):
            for dyc in (-1, 0, 1):
                f_src = my_f + dyc
                infold = (f_src >= 0) & (f_src < F)  # [1, nlane]
                sgn = 0 if dyc == 0 else (1 if dyc > 0 else -1)
                src_self = blocks[(dz, 0)]
                src_nbr = blocks[(dz, sgn)] if sgn != 0 else src_self
                for dxc in (-1, 0, 1):
                    s_in = dxc * F + dyc
                    s_out = s_in - sgn * F
                    if sgn != 0:
                        cand = [
                            jnp.where(
                                infold,
                                _shift_lanes(src_self[q], s_in, interpret),
                                _shift_lanes(src_nbr[q], s_out, interpret),
                            )
                            for q in range(n_q)
                        ]
                    else:
                        cand = [
                            _shift_lanes(src_self[q], s_in, interpret)
                            for q in range(n_q)
                        ]
                    cx_, cy_, cz_ = cand[0], cand[1], cand[2]
                    if dxc == 1:
                        cx_ = cx_ + jnp.where(my_cx == nx - 1, Lx, 0.0)
                    elif dxc == -1:
                        cx_ = cx_ + jnp.where(my_cx == 0, -Lx, 0.0)
                    pidv = cand[n_q - 1]

                    # candidate's destination cell from its position
                    fx_ = cx_ / Lx + 0.5
                    fy_ = cy_ / Ly + 0.5
                    fz_ = cz_ / Lz + 0.5
                    dcx = jnp.floor((fx_ - jnp.floor(fx_)) * fnx)
                    dcy = jnp.floor((fy_ - jnp.floor(fy_)) * fny)
                    dcz = jnp.floor((fz_ - jnp.floor(fz_)) * fnz)
                    valid = (
                        (pidv > 0.5)  # pid travels as pid+1; empty = 0
                        & (dcx == my_cx)
                        & (dcy == my_cy)
                        & (dcz == my_cz)
                    )
                    vf = valid.astype(jnp.float32)  # [cap, nlane]
                    # exclusive prefix rank within this candidate block
                    prefix = jax.lax.dot_general(
                        tri, vf,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    rank = base_rank + prefix  # [cap, nlane]
                    base_rank = base_rank + jnp.sum(vf, axis=0, keepdims=True)
                    onehot = (
                        (rank[None, :, :] == out_r) & valid[None, :, :]
                    ).astype(jnp.float32)  # [cap_out, cap_src, nlane]
                    # wrap positions into the primary box as we place them
                    wx = cx_ - Lx * jnp.round(cx_ / Lx)
                    wy = cy_ - Ly * jnp.round(cy_ / Ly)
                    wz = cz_ - Lz * jnp.round(cz_ / Lz)
                    vals = [wx, wy, wz] + [cand[q] for q in range(3, n_q)]
                    for q in range(n_q):
                        acc[q] = acc[q] + jnp.sum(
                            onehot * vals[q][None, :, :], axis=1
                        )
                    filled = filled + jnp.sum(onehot, axis=1)
                    overflow = overflow + jnp.sum(vf * (rank >= cap))
                    n_count = n_count + jnp.sum(vf)

        notfill = filled < 0.5
        acc[0] = jnp.where(notfill, EMPTY_POS, acc[0])
        acc[1] = jnp.where(notfill, EMPTY_POS, acc[1])
        acc[2] = jnp.where(notfill, EMPTY_POS, acc[2])
        # pid travels as pid+1: unfilled accumulators stay 0 -> -1 after
        # the caller's -1 shift; nothing to fix up here.
        for q in range(n_q):
            out_ref[q, 0, 0, :, :] = acc[q]
        # diagnostics as (8,128) tiles (TPU block tiling forbids (1,1)
        # blocks; broadcast the scalar — the caller reads [..., 0, 0])
        count_ref[0, 0, :, :] = jnp.full((8, 128), n_count)
        ovf_ref[0, 0, :, :] = jnp.full((8, 128), overflow)

    grid = (nz, nyb)

    def in_spec(dz, dyb):
        return pl.BlockSpec(
            (n_q, 1, 1, cap, nlane),
            functools.partial(_nbr_index, dz=dz, dyb=dyb, nz=nz, nyb=nyb),
            memory_space=pltpu.VMEM,
        )

    out_specs = [
        pl.BlockSpec(
            (n_q, 1, 1, cap, nlane),
            lambda z, yb: (0, z, yb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 8, 128), lambda z, yb: (z, yb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 8, 128), lambda z, yb: (z, yb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_q, nz, nyb, cap, nlane), jnp.float32),
        jax.ShapeDtypeStruct((nz, nyb, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((nz, nyb, 8, 128), jnp.float32),
    ]

    def rebin_stacked(stacked):
        out, counts, ovf = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec(dz, dyb) for (dz, dyb) in offsets],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*([stacked] * 9))
        return out, jnp.sum(counts[:, :, 0, 0]), jnp.sum(ovf[:, :, 0, 0])

    return rebin_stacked


def _nbr_index(z, yb, *, dz, dyb, nz, nyb):
    return (0, (z + dz) % nz, (yb + dyb) % nyb, 0, 0)


_KERNEL_CACHE = {}


def _get_kernel(spec, n_q):
    key = (spec, n_q, jax.default_backend())
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make_rebin_kernel(spec, n_q)
    return _KERNEL_CACHE[key]


def rebin_fast(gs: GridState) -> GridState:
    """Drop-in replacement for layout.rebin using the Pallas kernel.

    pid is carried as pid+1 in float32 (exact up to 2^24 particles) so the
    kernel's zero-filled accumulators map unfilled -> pid -1 naturally.
    """
    kern = _get_kernel(gs.spec, 10)
    stacked = jnp.stack(
        [
            gs.x, gs.y, gs.z,
            gs.vx, gs.vy, gs.vz,
            gs.fx, gs.fy, gs.fz,
            (gs.pid + 1).astype(jnp.float32),
        ]
    )
    out, count, ovf = kern(stacked)
    pid = out[9].astype(jnp.int32) - 1
    overflow = gs.overflow | (ovf > 0) | (count.astype(jnp.int32) != gs.n)
    return gs.replace(
        x=out[0], y=out[1], z=out[2],
        vx=out[3], vy=out[4], vz=out[5],
        fx=out[6], fy=out[7], fz=out[8],
        pid=pid, ref_x=out[0], ref_y=out[1], ref_z=out[2],
        overflow=overflow,
    )


def rebin_fast_noforce(gs: GridState) -> GridState:
    """Rebin carrying only (pos, vel, pid) — 30% cheaper than the full 10-
    quantity move. Valid whenever forces are recomputed immediately after
    (the Gronbech-Jensen step recomputes f right after the rebin, so f never
    needs to survive a slot shuffle)."""
    kern = _get_kernel(gs.spec, 7)
    stacked = jnp.stack(
        [
            gs.x, gs.y, gs.z,
            gs.vx, gs.vy, gs.vz,
            (gs.pid + 1).astype(jnp.float32),
        ]
    )
    out, count, ovf = kern(stacked)
    pid = out[6].astype(jnp.int32) - 1
    overflow = gs.overflow | (ovf > 0) | (count.astype(jnp.int32) != gs.n)
    zero = jnp.zeros_like(gs.fx)
    return gs.replace(
        x=out[0], y=out[1], z=out[2],
        vx=out[3], vy=out[4], vz=out[5],
        fx=zero, fy=zero, fz=zero,
        pid=pid, ref_x=out[0], ref_y=out[1], ref_z=out[2],
        overflow=overflow,
    )
