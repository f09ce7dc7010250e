"""Pallas TPU kernel: short-range pair forces on the grid-resident layout.

This is the hot inner loop of the framework — the TPU-native replacement for
the reference's transverseList CUDA kernel (reference: src/Interactor/
NeighbourList/NeighbourList/common.cuh:11 transverseWithNeighbourContainer and
CellList traversal, CellList.cuh:166). The design exploits what TPUs are good
at (regular VMEM blocks, lane rolls, VPU elementwise) and avoids what they
can't do (per-element gathers):

- One program per (z-slab, y-block). Its 3x3 (z, y-block) neighborhood of
  [CAP, NLANE] coordinate blocks is staged into VMEM by ``pallas_call``
  BlockSpecs with wrapped index maps.
- The 27-cell stencil becomes 27 static **lane rolls**: lane l encodes
  (cell-x, fold) = (l // F, l % F) with F consecutive y-rows folded per lane
  vector (see layout.py), so the (dx, dy) cell offset is a circular lane
  shift by dx*F + dy. Fold-crossing lanes borrow from the neighbor y-block
  via a static per-lane select; periodic images are handled by *adding*
  precomputed per-lane shift vectors to the candidate coordinates —
  minimum-image arithmetic costs zero per-pair work.
- Each of the 27 candidate blocks forms an all-pairs [CAP, CAP, NLANE]
  interaction block against the home block: pure VPU fma chains at ~85-95%
  of peak (measured), with empty slots auto-masked because their sentinel
  coordinates (layout.EMPTY_POS) fail the cutoff test.

The potential enters as two inlined callbacks g(r2) (= (dE/dr)/r) and
optionally e(r2), mirroring the reference Potential/Transverser split
(reference: src/Interactor/Potential/RadialPotential.cuh:18-53).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import GridSpec


def _lane_constants(spec: GridSpec):
    """Per-lane vectors (fold masks, x-wrap shifts), built from an in-kernel
    iota — Pallas kernels cannot capture array constants, but these are pure
    functions of the lane index, so we materialize them inside the kernel at
    negligible cost."""
    F = spec.fold
    nx = spec.shape[0]
    nlane = spec.nlane
    Lx = np.float32(spec.box_size[0])

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nlane), 1)
    cx = lane // F
    f = lane - cx * F
    consts = {}
    for dx in (-1, 0, 1):
        if dx == 1:
            consts[("xshift", dx)] = jnp.where(cx == nx - 1, Lx, np.float32(0))
        elif dx == -1:
            consts[("xshift", dx)] = jnp.where(cx == 0, -Lx, np.float32(0))
        else:
            consts[("xshift", dx)] = None
    for dy in (-1, 0, 1):
        consts[("infold", dy)] = (f + dy >= 0) & (f + dy < F)
    return consts


def _shift_lanes(a, s, interpret):
    """cand[l] = a[(l + s) mod NLANE]  (static s)."""
    n = a.shape[-1]
    shift = (-s) % n
    if shift == 0:
        return a
    if interpret:
        return jnp.roll(a, shift, axis=-1)
    return pltpu.roll(a, shift, axis=a.ndim - 1)


def make_pair_force_kernel(
    spec: GridSpec,
    g_fn: Callable,  # g(r2) -> (dE/dr)/r  (force = g * dr, dr = r_j - r_i)
    e_fn: Callable | None = None,  # e(r2) pair energy (half to each particle)
    *,
    compute_virial: bool = False,
    compute_stress: bool = False,
    interpret: bool | None = None,
    periodic_z: bool = True,
    clamp_lo: float = 4e-3,
):
    """Build force(x, y, z) -> (fx, fy, fz[, energy][, virial][, stress x 6]).

    ``compute_stress`` appends the 6 packed components of the symmetric
    per-particle stress tensor (xx, xy, xz, yy, yz, zz; -0.5 g dr_a dr_b,
    trace = virial — reference: src/Interactor/Interactor.cuh:98).

    Arrays are [nz, nyb, CAP, NLANE] float32 (layout.GridState fields).
    ``periodic_z=False`` runs in halo mode for domain decomposition
    (parallel/domain.py): z-neighbor indices still wrap via the index map,
    but no Lz image shift is applied — the caller supplies ghost slabs with
    already-shifted coordinates, and discards the ghost rows of the output.
    """
    nx, ny, nz = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    Ly, Lz = spec.box_size[1], spec.box_size[2]
    rc2 = np.float32(spec.cutoff * spec.cutoff)
    clamp_lo = np.float32(clamp_lo)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_extra = (
        (1 if e_fn is not None else 0)
        + (1 if compute_virial else 0)
        + (6 if compute_stress else 0)
    )

    # source blocks: (dz, dyb) for dz, dyb in 3x3; each for x, y, z coords
    offsets = [(dz, dyb) for dz in (-1, 0, 1) for dyb in (-1, 0, 1)]

    def kernel(*refs):
        # refs: 27 inputs (x blocks 9, y blocks 9, z blocks 9) + outputs
        xin = refs[0:9]
        yin = refs[9:18]
        zin = refs[18:27]
        outs = refs[27:]
        zpid = pl.program_id(0)
        ypid = pl.program_id(1)
        consts = _lane_constants(spec)

        blocks = {}
        for k, (dz, dyb) in enumerate(offsets):
            bx = xin[k][0, 0, :, :]
            by = yin[k][0, 0, :, :]
            bz = zin[k][0, 0, :, :]
            # periodic image adjustments for wrapped neighbor blocks
            if dyb == 1:
                by = by + jnp.where(ypid == nyb - 1, np.float32(Ly), 0.0)
            elif dyb == -1:
                by = by + jnp.where(ypid == 0, np.float32(-Ly), 0.0)
            if periodic_z:
                if dz == 1:
                    bz = bz + jnp.where(zpid == nz - 1, np.float32(Lz), 0.0)
                elif dz == -1:
                    bz = bz + jnp.where(zpid == 0, np.float32(-Lz), 0.0)
            blocks[(dz, dyb)] = (bx, by, bz)

        xi, yi, zi = blocks[(0, 0)]
        xi_ = xi[:, None, :]
        yi_ = yi[:, None, :]
        zi_ = zi[:, None, :]

        fx = jnp.zeros((cap, nlane), jnp.float32)
        fy = jnp.zeros((cap, nlane), jnp.float32)
        fz = jnp.zeros((cap, nlane), jnp.float32)
        en = jnp.zeros((cap, nlane), jnp.float32) if e_fn is not None else None
        vir = jnp.zeros((cap, nlane), jnp.float32) if compute_virial else None
        st = (
            [jnp.zeros((cap, nlane), jnp.float32) for _ in range(6)]
            if compute_stress else None
        )

        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                infold = consts[("infold", dy)]
                sgn = 0 if dy == 0 else (1 if dy > 0 else -1)
                src_self = blocks[(dz, 0)]
                src_nbr = blocks[(dz, sgn)] if sgn != 0 else src_self
                for dx in (-1, 0, 1):
                    s_in = dx * F + dy
                    s_out = s_in - sgn * F
                    cx_s, cy_s, cz_s = (
                        _shift_lanes(c, s_in, interpret) for c in src_self
                    )
                    if sgn != 0:
                        cx_n, cy_n, cz_n = (
                            _shift_lanes(c, s_out, interpret) for c in src_nbr
                        )
                        cx = jnp.where(infold, cx_s, cx_n)
                        cy = jnp.where(infold, cy_s, cy_n)
                        cz = jnp.where(infold, cz_s, cz_n)
                    else:
                        cx, cy, cz = cx_s, cy_s, cz_s
                    if consts[("xshift", dx)] is not None:
                        cx = cx + consts[("xshift", dx)]

                    dxv = cx[None, :, :] - xi_
                    dyv = cy[None, :, :] - yi_
                    dzv = cz[None, :, :] - zi_
                    r2 = dxv * dxv + dyv * dyv + dzv * dzv
                    if e_fn is None and not compute_virial and not compute_stress:
                        # Force-only fast mask: clamp instead of select.
                        # Self/degenerate slots (r2 = 0, dxv = 0) produce a
                        # finite g times an exactly-zero displacement; empty
                        # slots sit at EMPTY_POS so r2 ~ 1e18 fails the
                        # cutoff. One compare + one max instead of two
                        # compares + and + two selects per pair slot.
                        # Requires g_fn finite in f32 at r2 = clamp_lo.
                        r2s = jnp.maximum(r2, clamp_lo)
                        g = jnp.where(r2 < rc2, g_fn(r2s), 0.0)
                        fx = fx + jnp.sum(g * dxv, axis=1)
                        fy = fy + jnp.sum(g * dyv, axis=1)
                        fz = fz + jnp.sum(g * dzv, axis=1)
                        continue
                    inside = (r2 < rc2) & (r2 > 1e-10)
                    r2s = jnp.where(inside, r2, 1.0)
                    g = jnp.where(inside, g_fn(r2s), 0.0)
                    fx = fx + jnp.sum(g * dxv, axis=1)
                    fy = fy + jnp.sum(g * dyv, axis=1)
                    fz = fz + jnp.sum(g * dzv, axis=1)
                    if e_fn is not None:
                        en = en + 0.5 * jnp.sum(
                            jnp.where(inside, e_fn(r2s), 0.0), axis=1
                        )
                    if compute_virial:
                        vir = vir + jnp.sum(-0.5 * g * r2s * inside, axis=1)
                    if compute_stress:
                        hg = -0.5 * g
                        comps = (
                            (dxv, dxv), (dxv, dyv), (dxv, dzv),
                            (dyv, dyv), (dyv, dzv), (dzv, dzv),
                        )
                        for ci, (da, db) in enumerate(comps):
                            st[ci] = st[ci] + jnp.sum(hg * da * db, axis=1)

        outs[0][0, 0, :, :] = fx
        outs[1][0, 0, :, :] = fy
        outs[2][0, 0, :, :] = fz
        k = 3
        if e_fn is not None:
            outs[k][0, 0, :, :] = en
            k += 1
        if compute_virial:
            outs[k][0, 0, :, :] = vir
            k += 1
        if compute_stress:
            for ci in range(6):
                outs[k][0, 0, :, :] = st[ci]
                k += 1

    def block_spec(dz, dyb):
        return pl.BlockSpec(
            (1, 1, cap, nlane),
            functools.partial(
                _nbr_index, dz=dz, dyb=dyb, nz=nz, nyb=nyb
            ),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [block_spec(dz, dyb) for (dz, dyb) in offsets] * 3
    )
    out_spec = pl.BlockSpec(
        (1, 1, cap, nlane),
        lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = [
        jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
    ] * (3 + n_extra)

    bytes_per_block = cap * nlane * 4
    cost = pl.CostEstimate(
        flops=nz * nyb * 27 * cap * cap * nlane * 20,
        bytes_accessed=nz * nyb * (27 * 3 + 3 + n_extra) * bytes_per_block,
        transcendentals=0,
    )

    @jax.jit
    def force(x, y, z):
        outs = pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=[out_spec] * (3 + n_extra),
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*([x, y, z][i // 9] for i in range(27)))
        return outs

    return force


def _nbr_index(z, yb, *, dz, dyb, nz, nyb):
    return ((z + dz) % nz, (yb + dyb) % nyb, 0, 0)


def make_pair_channel_kernel(
    spec: GridSpec,
    pair_fn: Callable,
    n_chan: int,
    n_out: int,
    *,
    interpret: bool | None = None,
    periodic_z: bool = True,
    pair_both_fn: Callable | None = None,
):
    """General transverser on the grid-resident layout with per-particle
    payload channels (the reference's ``getInfo`` path — reference:
    src/utils/TransverserUtils.cuh:140-200 Delegator; used by DPD, SPH and
    the PSE near field, NearField.cuh).

    ``pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j) -> (out_0, ..., out_{n_out-1})``
    receives, per candidate block, the squared distance [cap_i, cap_j, nlane],
    the displacement components (r_j - r_i), the home channels ``ch_i``
    (each [cap_i, 1, nlane]) and candidate channels ``ch_j`` (each
    [1, cap_j, nlane]); it returns per-pair contributions that the kernel
    sums over the candidate axis into [cap, nlane] outputs.

    Must be self-safe: the home block appears among its own candidates, so
    pair_fn sees the exact self pair (r2 == 0, dxv = dyv = dzv = 0) and
    coincident empty sentinels; handle via clamping + the rc2 test (empty
    slots sit at layout.EMPTY_POS and fail any physical cutoff; empty
    channels are zero-filled by layout.pack_channels).

    force(x, y, z, *channels[, strag]) -> tuple of n_out [nz, nyb, CAP,
    NLANE] grid outputs. When ``spec.n_strag > 0`` a broadcast straggler
    block (``broadcast_strag_channels``) is a required trailing input and
    n_out extra [nz, nyb, S, NLANE] per-program straggler partials are
    appended (sum over (0, 1, 3) outside for the totals). The straggler
    pass evaluates pair_fn in BOTH directions (grid -> home outputs and,
    with negated displacements and swapped channel roles, home -> straggler
    partials), so pair_fn must be pure broadcasting arithmetic — true of
    every transverser here. ``pair_both_fn(r2, dxv, dyv, dzv, ch_i, ch_j)
    -> (fwd_outs, bwd_outs)`` optionally fuses the two directions so the
    radial-function evaluation is shared (the PSE Horner polynomials are
    ~60% of the pair cost). Straggler-straggler pairs are NOT included
    (O(S^2), do them in plain XLA — see pse_engine._strag_pair_apply).
    """
    nx, ny, nz = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    Lx, Ly, Lz = spec.box_size
    S = spec.n_strag
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Chunk the home axis so the live [chunk, cap, nlane] pair-block
    # intermediates across the unrolled 27 offsets stay within VMEM (Mosaic
    # schedules across the whole unrolled loop and keeps each offset's
    # intermediates live). Perf notes from the round-2 experiments:
    # unchunked spills ~180 MB at cap = 64; a lax.fori_loop body bounds the
    # live set but serializes the VPU ~90x (no cross-iteration pipelining);
    # home-chunking keeps full throughput up to cap ~ 48. Larger caps
    # use the straggler occupancy split (spec.n_strag).
    # live-set estimate scales with the array count (2 intermediates per
    # coordinate/channel array across the 27 unrolled offsets); for the
    # 3-channel matvec this is the measured round-2 constant 12 = 2 * n_arr
    budget = 48 * 1024 * 1024 // (
        (27 * 2 * (3 + n_chan) * cap + (24 * S if S else 0)) * nlane * 4
    )
    home_chunk = cap
    while home_chunk > 8 and home_chunk > budget:
        home_chunk //= 2
    if cap % home_chunk != 0:
        home_chunk = 8

    offsets = [(dz, dyb) for dz in (-1, 0, 1) for dyb in (-1, 0, 1)]
    n_arr = 3 + n_chan  # coordinate + channel arrays
    n_in = 9 * n_arr + (1 if S else 0)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        zpid = pl.program_id(0)
        ypid = pl.program_id(1)
        consts = _lane_constants(spec)

        blocks = {}
        for k, (dz, dyb) in enumerate(offsets):
            arrs = [ins[a * 9 + k][0, 0, :, :] for a in range(n_arr)]
            if dyb == 1:
                arrs[1] = arrs[1] + jnp.where(ypid == nyb - 1, np.float32(Ly), 0.0)
            elif dyb == -1:
                arrs[1] = arrs[1] + jnp.where(ypid == 0, np.float32(-Ly), 0.0)
            if periodic_z:
                if dz == 1:
                    arrs[2] = arrs[2] + jnp.where(zpid == nz - 1, np.float32(Lz), 0.0)
                elif dz == -1:
                    arrs[2] = arrs[2] + jnp.where(zpid == 0, np.float32(-Lz), 0.0)
            blocks[(dz, dyb)] = arrs

        home = blocks[(0, 0)]

        # build the 27 candidate blocks once ([cap, nlane] each — cheap)
        cands = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                infold = consts[("infold", dy)]
                sgn = 0 if dy == 0 else (1 if dy > 0 else -1)
                src_self = blocks[(dz, 0)]
                src_nbr = blocks[(dz, sgn)] if sgn != 0 else src_self
                for dx in (-1, 0, 1):
                    s_in = dx * F + dy
                    s_out = s_in - sgn * F
                    if sgn != 0:
                        cand = [
                            jnp.where(
                                infold,
                                _shift_lanes(src_self[a], s_in, interpret),
                                _shift_lanes(src_nbr[a], s_out, interpret),
                            )
                            for a in range(n_arr)
                        ]
                    else:
                        cand = [
                            _shift_lanes(src_self[a], s_in, interpret)
                            for a in range(n_arr)
                        ]
                    if consts[("xshift", dx)] is not None:
                        cand[0] = cand[0] + consts[("xshift", dx)]
                    cands.append(cand)

        def hslice(a, h0):
            return jax.lax.slice_in_dim(a, h0, h0 + home_chunk, axis=0)

        if S:
            sblk = ins[9 * n_arr][:, :, :]  # [n_arr + 1, S, nlane]
            sx = sblk[0][None, :, :]
            sy = sblk[1][None, :, :]
            sz = sblk[2][None, :, :]
            ch_s = [sblk[3 + c][None, :, :] for c in range(n_chan)]
            sval = sblk[n_arr][None, :, :] > 0.5
            saccs = [
                jnp.zeros((S, nlane), jnp.float32) for _ in range(n_out)
            ]
            iLx, iLy, iLz = (
                np.float32(1.0 / v) for v in (Lx, Ly, Lz)
            )

        for h0 in range(0, cap, home_chunk):
            hs = slice(h0, h0 + home_chunk)
            xi_ = hslice(home[0], h0)[:, None, :]
            yi_ = hslice(home[1], h0)[:, None, :]
            zi_ = hslice(home[2], h0)[:, None, :]
            ch_i = [hslice(home[3 + c], h0)[:, None, :] for c in range(n_chan)]
            accs = [
                jnp.zeros((home_chunk, nlane), jnp.float32)
                for _ in range(n_out)
            ]
            for cand in cands:
                dxv = cand[0][None, :, :] - xi_
                dyv = cand[1][None, :, :] - yi_
                dzv = cand[2][None, :, :] - zi_
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                ch_j = [cand[3 + c][None, :, :] for c in range(n_chan)]
                contribs = pair_fn(r2, dxv, dyv, dzv, ch_i, ch_j)
                for o in range(n_out):
                    accs[o] = accs[o] + jnp.sum(contribs[o], axis=1)
            if S:
                # straggler broadcast block: explicit minimum image (a
                # straggler is anywhere in the box), plus a hard validity
                # mask — the MI wrap can fold EMPTY_POS sentinels back into
                # cutoff range, so the r2 test alone is not safe here.
                dxv = sx - xi_
                dyv = sy - yi_
                dzv = sz - zi_
                dxv = dxv - np.float32(Lx) * jnp.round(dxv * iLx)
                dyv = dyv - np.float32(Ly) * jnp.round(dyv * iLy)
                dzv = dzv - np.float32(Lz) * jnp.round(dzv * iLz)
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                ok = sval & (xi_ < np.float32(1.0e8))
                r2m = jnp.where(ok, r2, np.float32(1.0e18))
                if pair_both_fn is not None:
                    contribs, back = pair_both_fn(
                        r2m, dxv, dyv, dzv, ch_i, ch_s
                    )
                else:
                    contribs = pair_fn(r2m, dxv, dyv, dzv, ch_i, ch_s)
                    # reverse direction: straggler as receiver (negated
                    # displacements, swapped channel roles)
                    back = pair_fn(r2m, -dxv, -dyv, -dzv, ch_s, ch_i)
                for o in range(n_out):
                    accs[o] = accs[o] + jnp.sum(contribs[o], axis=1)
                    saccs[o] = saccs[o] + jnp.sum(back[o], axis=0)
            for o in range(n_out):
                outs[o][0, 0, hs, :] = accs[o]
        if S:
            for o in range(n_out):
                outs[n_out + o][0, 0, :, :] = saccs[o]

    def block_spec(dz, dyb):
        return pl.BlockSpec(
            (1, 1, cap, nlane),
            functools.partial(_nbr_index, dz=dz, dyb=dyb, nz=nz, nyb=nyb),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        block_spec(dz, dyb) for _ in range(n_arr) for (dz, dyb) in offsets
    ]
    if S:
        in_specs.append(
            pl.BlockSpec(
                (n_arr + 1, S, nlane), lambda z, yb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (1, 1, cap, nlane),
        lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [out_spec] * n_out
    out_shape = [
        jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
    ] * n_out
    if S:
        out_specs += [
            pl.BlockSpec(
                (1, 1, S, nlane), lambda z, yb: (z, yb, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * n_out
        out_shape += [
            jax.ShapeDtypeStruct((nz, nyb, S, nlane), jnp.float32)
        ] * n_out

    bytes_per_block = cap * nlane * 4
    cost = pl.CostEstimate(
        flops=nz * nyb * (27 * cap + 2 * S) * cap * nlane * (20 + 6 * n_chan),
        bytes_accessed=nz * nyb * (27 * n_arr + n_out) * bytes_per_block,
        transcendentals=0,
    )

    @jax.jit
    def apply(x, y, z, *channels, strag=None):
        assert len(channels) == n_chan
        arrs = [x, y, z, *channels]
        args = [arrs[i // 9] for i in range(9 * n_arr)]
        if S:
            args.append(strag)
        outs = pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=cost,
            # 112 MB of the v5e's 128 MB VMEM: the 6-channel fused matvec
            # (PSE M F + first Lanczos matvec) peaks at ~103 MB with a
            # straggler block of S ~ 192 — the old 100 MB cap OOM'd it by
            # 2.6 MB while the hardware has 25 MB of headroom left.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        return outs

    return apply


def broadcast_strag_channels(spec: GridSpec, spos, schannels, spid):
    """[S, 3] straggler positions + [S] channels + validity -> the
    [3 + C + 1, S, NLANE] broadcast block consumed by the channel kernel."""
    S = spec.n_strag
    val = (spid >= 0).astype(jnp.float32)
    stack = jnp.stack(
        [spos[:, 0], spos[:, 1], spos[:, 2], *schannels, val]
    )  # [3 + C + 1, S]
    return jnp.broadcast_to(
        stack[:, :, None], (stack.shape[0], S, spec.nlane)
    )
