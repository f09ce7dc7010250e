"""Pallas TPU pair-force kernel v2: Newton's third law + straggler rows.

Second-generation hot loop (see pair_kernel.py for the baseline design and
the lane/fold encoding). Two structural upgrades over v1, both aimed at the
reference benchmark workload (reference: examples/misc/benchmark.cu):

1. **Newton halving** (reference exploits it implicitly by thread-per-
   particle symmetry; here it halves *candidate block* work): instead of all
   27 stencil offsets, each program enumerates only the self block plus the
   13 lexicographically-positive offsets, computing each pair interaction
   once. The force on the home particle accumulates locally; the equal and
   opposite reaction on the candidate particle is reduced over the home axis,
   rotated back into the candidate's own lane coordinates (undoing the
   fold-aware lane roll), and written to one of four *reaction group* arrays
   keyed by the candidate block's (dz, dyb) displacement. A cheap fold pass
   (``fold_reactions``) then adds each group at its shifted block index:

       f_total[z, yb] = home[z, yb] + sum_g G_g[z - dz_g, yb - dyb_g]

   Reactions targeting the home program's own block ((dz, dyb) = (0, 0))
   are folded in-kernel and never leave VMEM.

2. **Straggler rows** (GridSpec.n_strag): CAP covers the bulk occupancy;
   the few overflow particles ride in a dense [S] side list that every
   program sees as one broadcast candidate block with explicit minimum-image
   wrapping. Forces on the stragglers themselves are reduced over the home
   axis into per-program partials summed outside. Straggler-straggler pairs
   are O(S^2) and handled in plain XLA (straggler_pair_forces).

The potential enters as g(r2) = (dE/dr)/r exactly as in v1.
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
from .pair_kernel import _lane_constants, _shift_lanes

# positive (lexicographic) stencil offsets: every unordered cell pair
# appears exactly once across {self} + POS_OFFSETS
POS_OFFSETS = (
    [(1, dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    + [(0, 1, dx) for dx in (-1, 0, 1)]
    + [(0, 0, 1)]
)
# reaction groups: (dz, dyb) displacement of the candidate *block*
REACTION_GROUPS = ((1, -1), (1, 0), (1, 1), (0, 1))


def make_newton_pair_kernel(
    spec: GridSpec,
    g_fn: Callable,
    *,
    interpret: bool | None = None,
    clamp_lo: float = 4e-3,
    self_half: bool = False,
    strag_cellcenter: bool = False,
    halo_z: bool = False,
    _timing_no_reaction: bool = False,
    _timing_mode: str | None = None,
):
    """Build force(x, y, z[, strag]) ->
    (home_f[3], groups[4][3], strag_partial[3 if S else 0]).

    ``strag`` is the [4, S, NLANE] broadcast straggler block
    (x, y, z, valid) — see ``broadcast_stragglers``.

    ``halo_z=True`` is the domain-decomposition mode (parallel/domain2.py):
    spec.shape[2] counts the *home* rows of one z-slab, and the z axis is
    NOT periodic. Instead the caller passes a pre-shifted ghost row (the up
    neighbor's first home row) as three extra [1, nyb, cap, nlane] inputs:
    ``force(x, y, z, gx, gy, gz[, strag])``. Programs at the top home row
    select the ghost blocks as their dz=+1 candidates; reactions they
    compute onto the ghost (returned in the (1, dyb) group rows at
    z = nz-1) belong to the up neighbor and must be ppermuted there by the
    caller before the fold. Per-program work is identical to the periodic
    single-chip kernel — the halo cost is pure boundary traffic.
    """
    nx, ny, nz = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    S = spec.n_strag
    Lx, Ly, Lz = (np.float32(v) for v in spec.box_size)
    iLx, iLy, iLz = (np.float32(1.0 / v) for v in spec.box_size)
    rc2 = np.float32(spec.cutoff * spec.cutoff)
    clamp_lo = np.float32(clamp_lo)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if halo_z:
        assert not strag_cellcenter, (
            "strag_cellcenter needs global cell centers; unsupported in "
            "halo mode")

    # source blocks needed for self + positive offsets
    blocks_needed = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    dz1_blocks = [(dz, dyb) for (dz, dyb) in blocks_needed if dz == 1]
    nblk = len(blocks_needed)
    n_ghost = 9 if halo_z else 0
    n_in = 3 * nblk + n_ghost + (1 if S else 0)
    n_out = 3 + 12 + (3 if S else 0)

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        zpid = pl.program_id(0)
        ypid = pl.program_id(1)
        consts = _lane_constants(spec)

        blocks = {}
        for k, (dz, dyb) in enumerate(blocks_needed):
            bx = ins[k][0, 0, :, :]
            by = ins[nblk + k][0, 0, :, :]
            bz = ins[2 * nblk + k][0, 0, :, :]
            if halo_z and dz == 1:
                # top home row: candidates come from the ghost row, whose
                # z is already image-shifted by the caller
                j = dz1_blocks.index((dz, dyb))
                sel = zpid == nz - 1
                bx = jnp.where(sel, ins[3 * nblk + j][0, 0, :, :], bx)
                by = jnp.where(sel, ins[3 * nblk + 3 + j][0, 0, :, :], by)
                bz = jnp.where(sel, ins[3 * nblk + 6 + j][0, 0, :, :], bz)
            if dyb == 1:
                by = by + jnp.where(ypid == nyb - 1, Ly, 0.0)
            elif dyb == -1:
                by = by + jnp.where(ypid == 0, -Ly, 0.0)
            if dz == 1 and not halo_z:
                bz = bz + jnp.where(zpid == nz - 1, Lz, 0.0)
            blocks[(dz, dyb)] = (bx, by, bz)

        xi, yi, zi = blocks[(0, 0)]
        xi_ = xi[:, None, :]
        yi_ = yi[:, None, :]
        zi_ = zi[:, None, :]

        fx = jnp.zeros((cap, nlane), jnp.float32)
        fy = jnp.zeros((cap, nlane), jnp.float32)
        fz = jnp.zeros((cap, nlane), jnp.float32)
        grp = {
            g: [jnp.zeros((cap, nlane), jnp.float32) for _ in range(3)]
            for g in REACTION_GROUPS
        }

        if getattr(g_fn, "fused", False):
            # g_fn applies the cutoff + degenerate-slot selects itself
            # (md.lj_g_fused) — two fewer VPU ops per candidate slot
            pair_g = g_fn
        else:
            def pair_g(r2):
                r2s = jnp.maximum(r2, clamp_lo)
                return jnp.where(r2 < rc2, g_fn(r2s), 0.0)

        if self_half and not interpret:
            # ---- self block, Newton-halved: circulant pair enumeration.
            # Candidate sublane j = (i + k) mod cap for k = 1..cap/2 covers
            # every unordered in-cell pair once (k = cap/2 twice for even
            # cap, so that rung skips the reaction write-back): cap^2/2
            # candidate slots instead of cap^2, at the price of 4 sublane
            # rolls per rung.
            def _roll_sub(a, k):
                return pltpu.roll(a, k % cap, axis=0)

            for k in range(1, cap // 2 + 1):
                cxk = _roll_sub(xi, -k)
                cyk = _roll_sub(yi, -k)
                czk = _roll_sub(zi, -k)
                dxv = cxk - xi
                dyv = cyk - yi
                dzv = czk - zi
                g = pair_g(dxv * dxv + dyv * dyv + dzv * dzv)
                tx = g * dxv
                ty = g * dyv
                tz = g * dzv
                fx = fx + tx
                fy = fy + ty
                fz = fz + tz
                if 2 * k != cap:
                    fx = fx - _roll_sub(tx, k)
                    fy = fy - _roll_sub(ty, k)
                    fz = fz - _roll_sub(tz, k)
        else:
            # ---- self block: full all-pairs, both directions in one go
            dxv = xi[None, :, :] - xi_
            dyv = yi[None, :, :] - yi_
            dzv = zi[None, :, :] - zi_
            g = pair_g(dxv * dxv + dyv * dyv + dzv * dzv)
            fx = fx + jnp.sum(g * dxv, axis=1)
            fy = fy + jnp.sum(g * dyv, axis=1)
            fz = fz + jnp.sum(g * dzv, axis=1)

        # ---- positive offsets: compute once, route the reaction back
        for (dz, dy, dx) in POS_OFFSETS:
            infold = consts[("infold", dy)]
            sgn = 0 if dy == 0 else (1 if dy > 0 else -1)
            src_self = blocks[(dz, 0)]
            src_nbr = blocks[(dz, sgn)] if sgn != 0 else src_self
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
            g = pair_g(dxv * dxv + dyv * dyv + dzv * dzv)
            tx = g * dxv
            ty = g * dyv
            tz = g * dzv
            fx = fx + jnp.sum(tx, axis=1)
            fy = fy + jnp.sum(ty, axis=1)
            fz = fz + jnp.sum(tz, axis=1)
            if _timing_no_reaction or _timing_mode == "noreact":
                continue  # perf-probe mode: wrong physics, no write-back
            if _timing_mode == "sumonly":
                # probe: pay the cube reduction, skip shift/route (wrong
                # physics): accumulate raw reaction sums into group 0
                for c, t in ((0, tx), (1, ty), (2, tz)):
                    grp[REACTION_GROUPS[0]][c] = (
                        grp[REACTION_GROUPS[0]][c] - jnp.sum(t, axis=0)
                    )
                continue
            if _timing_mode == "routeonly":
                # probe: skip the cube reduction (reuse the home sums as a
                # stand-in r), pay the full shift/route machinery
                stand_in = {0: jnp.sum(tx, axis=1),
                            1: jnp.sum(ty, axis=1),
                            2: jnp.sum(tz, axis=1)}
                for c in range(3):
                    r = -stand_in[c]
                    if sgn != 0:
                        rin = _shift_lanes(
                            jnp.where(infold, r, 0.0), -s_in, interpret
                        )
                        rout = _shift_lanes(
                            jnp.where(infold, 0.0, r), -s_out, interpret
                        )
                        if dz == 0:
                            if c == 0:
                                fx = fx + rin
                            elif c == 1:
                                fy = fy + rin
                            else:
                                fz = fz + rin
                        else:
                            grp[(dz, 0)][c] = grp[(dz, 0)][c] + rin
                        grp[(dz, sgn)][c] = grp[(dz, sgn)][c] + rout
                    else:
                        rin = _shift_lanes(r, -s_in, interpret)
                        if dz == 0:
                            if c == 0:
                                fx = fx + rin
                            elif c == 1:
                                fy = fy + rin
                            else:
                                fz = fz + rin
                        else:
                            grp[(dz, 0)][c] = grp[(dz, 0)][c] + rin
                continue
            # reaction on the candidates, in candidate lane coordinates
            for c, t in ((0, tx), (1, ty), (2, tz)):
                r = -jnp.sum(t, axis=0)  # [cap_j, nlane], home-lane coords
                if sgn != 0:
                    rin = _shift_lanes(
                        jnp.where(infold, r, 0.0), -s_in, interpret
                    )
                    rout = _shift_lanes(
                        jnp.where(infold, 0.0, r), -s_out, interpret
                    )
                    if dz == 0:
                        # infold part targets this very block
                        if c == 0:
                            fx = fx + rin
                        elif c == 1:
                            fy = fy + rin
                        else:
                            fz = fz + rin
                    else:
                        grp[(dz, 0)][c] = grp[(dz, 0)][c] + rin
                    grp[(dz, sgn)][c] = grp[(dz, sgn)][c] + rout
                else:
                    rin = _shift_lanes(r, -s_in, interpret)
                    if dz == 0:
                        if c == 0:
                            fx = fx + rin
                        elif c == 1:
                            fy = fy + rin
                        else:
                            fz = fz + rin
                    else:
                        grp[(dz, 0)][c] = grp[(dz, 0)][c] + rin

        # ---- straggler broadcast block (minimum image, both directions)
        if S:
            sblk = ins[3 * nblk + n_ghost][:, :, :]  # [4, S, nlane]
            if strag_cellcenter and getattr(g_fn, "fused", False):
                # Cheap wrap: min-image the straggler coordinates ONCE per
                # (program, lane) against the home CELL CENTER ([S, nlane]
                # ops) instead of per candidate pair ([cap, S, nlane] cube
                # ops). Correct because any pair within the cutoff has the
                # other image at >= L/2 - (cell/2 + drift) >> rcut, and
                # out-of-cutoff pairs only need to FAIL the cutoff test —
                # the fused g's select does that whatever image was picked.
                # The home-empty mask is also unneeded (empty slots sit at
                # EMPTY_POS -> r2 ~ 1e18 fails the cutoff); only the
                # straggler-validity mask survives, as one cube multiply.
                cs = [np.float32(v) for v in spec.cell_size]
                lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, nlane), 1)
                cxf = (lane_i // F).astype(jnp.float32)
                ff = (lane_i % F).astype(jnp.float32)
                ccx = (cxf + 0.5) * cs[0] - 0.5 * Lx
                yrow = ypid.astype(jnp.float32) * np.float32(F) + ff
                ccy = (yrow + 0.5) * cs[1] - 0.5 * Ly
                ccz = (zpid.astype(jnp.float32) + 0.5) * cs[2] - 0.5 * Lz
                sxw = sblk[0] - Lx * jnp.round((sblk[0] - ccx) * iLx)
                syw = sblk[1] - Ly * jnp.round((sblk[1] - ccy) * iLy)
                szw = sblk[2] - Lz * jnp.round((sblk[2] - ccz) * iLz)
                svalf = sblk[3][None, :, :]
                dxv = sxw[None, :, :] - xi_
                dyv = syw[None, :, :] - yi_
                dzv = szw[None, :, :] - zi_
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                g = g_fn(r2) * svalf
                tx = g * dxv
                ty = g * dyv
                tz = g * dzv
                fx = fx + jnp.sum(tx, axis=1)
                fy = fy + jnp.sum(ty, axis=1)
                fz = fz + jnp.sum(tz, axis=1)
                outs[15][0, 0, :, :] = -jnp.sum(tx, axis=0)
                outs[16][0, 0, :, :] = -jnp.sum(ty, axis=0)
                outs[17][0, 0, :, :] = -jnp.sum(tz, axis=0)
                _write_outputs(outs, fx, fy, fz, grp)
                return
            sx = sblk[0][None, :, :]
            sy = sblk[1][None, :, :]
            sz = sblk[2][None, :, :]
            sval = sblk[3][None, :, :] > 0.5
            vhome = (xi_ < 1.0e8)
            dxv = sx - xi_
            dyv = sy - yi_
            dzv = sz - zi_
            dxv = dxv - Lx * jnp.round(dxv * iLx)
            dyv = dyv - Ly * jnp.round(dyv * iLy)
            dzv = dzv - Lz * jnp.round(dzv * iLz)
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            ok = (r2 < rc2) & sval & vhome
            if getattr(g_fn, "fused", False):
                g = g_fn(r2) * ok.astype(jnp.float32)
            else:
                g = jnp.where(ok, g_fn(jnp.maximum(r2, clamp_lo)), 0.0)
            tx = g * dxv
            ty = g * dyv
            tz = g * dzv
            fx = fx + jnp.sum(tx, axis=1)
            fy = fy + jnp.sum(ty, axis=1)
            fz = fz + jnp.sum(tz, axis=1)
            outs[15][0, 0, :, :] = -jnp.sum(tx, axis=0)
            outs[16][0, 0, :, :] = -jnp.sum(ty, axis=0)
            outs[17][0, 0, :, :] = -jnp.sum(tz, axis=0)

        _write_outputs(outs, fx, fy, fz, grp)

    def block_spec(dz, dyb):
        idx = functools.partial(
            _blk_index_halo if halo_z else _blk_index,
            dz=dz, dyb=dyb, nz=nz, nyb=nyb,
        )
        return pl.BlockSpec(
            (1, 1, cap, nlane), idx, memory_space=pltpu.VMEM,
        )

    in_specs = [block_spec(dz, dyb) for _ in range(3) for (dz, dyb) in blocks_needed]
    if halo_z:
        for _ in range(3):
            for (_, dyb) in dz1_blocks:
                in_specs.append(
                    pl.BlockSpec(
                        (1, 1, cap, nlane),
                        functools.partial(
                            _ghost_index, dyb=dyb, nyb=nyb
                        ),
                        memory_space=pltpu.VMEM,
                    )
                )
    if S:
        in_specs.append(
            pl.BlockSpec(
                (4, S, nlane), lambda z, yb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [out_spec] * 15
    out_shape = [
        jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
    ] * 15
    if S:
        out_specs += [
            pl.BlockSpec(
                (1, 1, S, nlane), lambda z, yb: (z, yb, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 3
        out_shape += [
            jax.ShapeDtypeStruct((nz, nyb, S, nlane), jnp.float32)
        ] * 3

    bytes_per_block = cap * nlane * 4
    cost = pl.CostEstimate(
        flops=nz * nyb * (14 * cap + S) * cap * nlane * 22,
        bytes_accessed=nz * nyb * (15 + n_out) * bytes_per_block,
        transcendentals=0,
    )

    @jax.jit
    def force(x, y, z, *extra):
        args = [[x, y, z][i // nblk] for i in range(3 * nblk)]
        if halo_z:
            gx, gy, gz = extra[0], extra[1], extra[2]
            extra = extra[3:]
            for g in (gx, gy, gz):
                args += [g] * 3
        if S:
            args.append(extra[0])
        return pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return force


def _write_outputs(outs, fx, fy, fz, grp):
    outs[0][0, 0, :, :] = fx
    outs[1][0, 0, :, :] = fy
    outs[2][0, 0, :, :] = fz
    k = 3
    for gkey in REACTION_GROUPS:
        for c in range(3):
            outs[k][0, 0, :, :] = grp[gkey][c]
            k += 1


def _blk_index(z, yb, *, dz, dyb, nz, nyb):
    return ((z + dz) % nz, (yb + dyb) % nyb, 0, 0)


def _blk_index_halo(z, yb, *, dz, dyb, nz, nyb):
    """Non-periodic z (halo mode): clamp instead of wrap. The clamped loads
    at the boundary row are replaced in-kernel by ghost/recv selects."""
    zi = z + dz
    if dz == 1:
        zi = jnp.minimum(zi, nz - 1)
    elif dz == -1:
        zi = jnp.maximum(zi, 0)
    return (zi, (yb + dyb) % nyb, 0, 0)


def _ghost_index(z, yb, *, dyb, nyb):
    return (0, (yb + dyb) % nyb, 0, 0)


def make_fold_kernel(spec: GridSpec, *, interpret: bool | None = None):
    """Fold the 4 reaction groups into the home forces:
    f[z, yb] = home[z, yb] + sum_g G_g[(z - dz_g) % nz, (yb - dyb_g) % nyb].
    """
    nz, nyb, cap, nlane = spec.array_shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        ins = refs[:15]
        outs = refs[15:]
        for c in range(3):
            acc = ins[c][0, 0, :, :]
            for gi in range(4):
                acc = acc + ins[3 + gi * 3 + c][0, 0, :, :]
            outs[c][0, 0, :, :] = acc

    home_spec = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [home_spec] * 3
    for (dz, dyb) in REACTION_GROUPS:
        in_specs += [
            pl.BlockSpec(
                (1, 1, cap, nlane),
                functools.partial(
                    _blk_index, dz=-dz, dyb=-dyb, nz=nz, nyb=nyb
                ),
                memory_space=pltpu.VMEM,
            )
        ] * 3

    @jax.jit
    def fold(home, groups):
        args = list(home)
        for g in groups:
            args += list(g)
        return pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=[home_spec] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
            ] * 3,
            interpret=interpret,
        )(*args)

    return fold


def fold_reactions_jnp(home, groups):
    """XLA fallback of make_fold_kernel (CPU tests; jnp.roll on block axes)."""
    out = list(home)
    for (dz, dyb), g in zip(REACTION_GROUPS, groups):
        for c in range(3):
            out[c] = out[c] + jnp.roll(g[c], shift=(dz, dyb), axis=(0, 1))
    return tuple(out)


def make_fold_kernel_halo(spec: GridSpec, *, interpret: bool | None = None):
    """Halo-mode reaction fold (parallel/domain2.py): like make_fold_kernel
    but z is a non-periodic slab. The (1, dyb) reactions arriving at home
    row 0 come from the DOWN neighbor's top-row groups, passed as 9 extra
    ``recv`` inputs of [1, nyb, cap, nlane]:

        fold(home3, groups4x3, recvs9) -> (fx, fy, fz)

    recvs order matches REACTION_GROUPS[:3] x (x, y, z).
    """
    nz, nyb, cap, nlane = spec.array_shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        ins = refs[:24]
        outs = refs[24:]
        zpid = pl.program_id(0)
        at0 = zpid == 0
        for c in range(3):
            acc = ins[c][0, 0, :, :]
            for gi in range(4):
                blk = ins[3 + gi * 3 + c][0, 0, :, :]
                if REACTION_GROUPS[gi][0] == 1:
                    recv = ins[15 + gi * 3 + c][0, 0, :, :]
                    blk = jnp.where(at0, recv, blk)
                acc = acc + blk
            outs[c][0, 0, :, :] = acc

    home_spec = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [home_spec] * 3
    for (dz, dyb) in REACTION_GROUPS:
        in_specs += [
            pl.BlockSpec(
                (1, 1, cap, nlane),
                functools.partial(
                    _blk_index_halo, dz=-dz, dyb=-dyb, nz=nz, nyb=nyb
                ),
                memory_space=pltpu.VMEM,
            )
        ] * 3
    for (dz, dyb) in REACTION_GROUPS[:3]:
        in_specs += [
            pl.BlockSpec(
                (1, 1, cap, nlane),
                functools.partial(_ghost_index, dyb=-dyb, nyb=nyb),
                memory_space=pltpu.VMEM,
            )
        ] * 3

    @jax.jit
    def fold(home, groups, recvs):
        args = list(home)
        for g in groups:
            args += list(g)
        args += list(recvs)
        return pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=[home_spec] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
            ] * 3,
            interpret=interpret,
        )(*args)

    return fold


def fold_reactions_halo_jnp(home, groups, recvs):
    """XLA mirror of make_fold_kernel_halo."""
    out = list(home)
    for gi, ((dz, dyb), g) in enumerate(zip(REACTION_GROUPS, groups)):
        for c in range(3):
            arr = g[c]
            if dz == 1:
                arr = jnp.concatenate([recvs[gi * 3 + c], arr[:-1]], axis=0)
            out[c] = out[c] + jnp.roll(arr, dyb, axis=1)
    return tuple(out)


def broadcast_stragglers(spec: GridSpec, spos, spid):
    """[S, 3] straggler positions + validity -> the [4, S, NLANE] broadcast
    block consumed by the v2 kernel."""
    S = spec.n_strag
    val = (spid >= 0).astype(jnp.float32)
    stack = jnp.stack(
        [spos[:, 0], spos[:, 1], spos[:, 2], val]
    )  # [4, S]
    return jnp.broadcast_to(stack[:, :, None], (4, S, spec.nlane))


def straggler_pair_forces(spec: GridSpec, g_fn, spos, spid,
                          clamp_lo: float = 4e-3):
    """O(S^2) straggler-straggler forces (minimum image), [S, 3]."""
    Ls = jnp.asarray(spec.box_size, jnp.float32)
    rc2 = np.float32(spec.cutoff * spec.cutoff)
    val = spid >= 0
    d = spos[None, :, :] - spos[:, None, :]
    d = d - Ls * jnp.round(d / Ls)
    r2 = jnp.sum(d * d, axis=-1)
    ok = (r2 < rc2) & (r2 > 1e-10) & val[None, :] & val[:, None]
    g = jnp.where(ok, g_fn(jnp.maximum(r2, np.float32(clamp_lo))), 0.0)
    return jnp.sum(g[:, :, None] * d, axis=1)


def make_fold_kernel_n(spec: GridSpec, n: int, *,
                       interpret: bool | None = None):
    """n-channel generalization of make_fold_kernel:
    fold(home[n], groups[4][n]) -> tuple of n folded grids."""
    nz, nyb, cap, nlane = spec.array_shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(*refs):
        ins = refs[: 5 * n]
        outs = refs[5 * n:]
        for c in range(n):
            acc = ins[c][0, 0, :, :]
            for gi in range(4):
                acc = acc + ins[n + gi * n + c][0, 0, :, :]
            outs[c][0, 0, :, :] = acc

    home_spec = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [home_spec] * n
    for (dz, dyb) in REACTION_GROUPS:
        in_specs += [
            pl.BlockSpec(
                (1, 1, cap, nlane),
                functools.partial(
                    _blk_index, dz=-dz, dyb=-dyb, nz=nz, nyb=nyb
                ),
                memory_space=pltpu.VMEM,
            )
        ] * n

    @jax.jit
    def fold(home, groups):
        args = list(home)
        for g in groups:
            args += list(g)
        return pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=[home_spec] * n,
            out_shape=[
                jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
            ] * n,
            interpret=interpret,
        )(*args)

    return fold


def fold_reactions_n_jnp(home, groups):
    """XLA mirror of make_fold_kernel_n."""
    out = list(home)
    for (dz, dyb), g in zip(REACTION_GROUPS, groups):
        for c in range(len(out)):
            out[c] = out[c] + jnp.roll(g[c], shift=(dz, dyb), axis=(0, 1))
    return tuple(out)


def make_newton_channel_kernel(
    spec: GridSpec,
    pair_both_fn: Callable,
    n_chan: int,
    n_out: int,
    *,
    interpret: bool | None = None,
    fold_in_pallas: bool | None = None,
):
    """Newton-halved channel transverser: drop-in for
    pair_kernel.make_pair_channel_kernel with the same output contract
    (``apply(x, y, z, *channels[, strag]) -> n_out grids [+ n_out
    straggler-partial grids]``), but each unordered cell-block pair is
    enumerated ONCE — the reverse contribution comes from
    ``pair_both_fn``'s second output, reduced over the home axis, rotated
    back to candidate lane coordinates and folded via the four reaction
    groups exactly as make_newton_pair_kernel does for forces. The shared
    radial evaluation (the dominant PSE pair cost, deg-12 Horner x4) is
    paid once per pair instead of twice, so a matvec pass costs ~0.55x
    the 27-stencil kernel (reference exploits the same symmetry by
    thread-per-particle accumulation, src/Interactor/PairForces.cu).

    ``pair_both_fn(r2, dxv, dyv, dzv, ch_i, ch_j) -> (fwd, bwd)`` must be
    pure broadcasting arithmetic; ``fwd`` are contributions to the home
    rows (summed over axis 1), ``bwd`` to the candidate rows (summed over
    axis 0). The self block runs full all-pairs with ``fwd`` only (every
    ordered in-cell pair enumerated), so pair_both_fn must be self-safe
    exactly as in the 27-stencil kernel.
    """
    nx, ny, nz = spec.shape
    F = spec.fold
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    S = spec.n_strag
    Lx, Ly, Lz = (np.float32(v) for v in spec.box_size)
    iLx, iLy, iLz = (np.float32(1.0 / v) for v in spec.box_size)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fold_in_pallas is None:
        fold_in_pallas = not interpret

    blocks_needed = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    nblk = len(blocks_needed)
    n_arr = 3 + n_chan
    n_in = nblk * n_arr + (1 if S else 0)
    n_raw = 5 * n_out + (n_out if S else 0)  # home + 4 groups (+ strag)

    # home-axis chunking (see make_pair_channel_kernel): 14 candidate
    # blocks live instead of 27
    budget = 48 * 1024 * 1024 // (
        (14 * 2 * n_arr * cap + (24 * S if S else 0)) * nlane * 4
    )
    home_chunk = cap
    while home_chunk > 8 and home_chunk > budget:
        home_chunk //= 2
    if cap % home_chunk != 0:
        home_chunk = 8

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:]
        zpid = pl.program_id(0)
        ypid = pl.program_id(1)
        consts = _lane_constants(spec)

        blocks = {}
        for k, (dz, dyb) in enumerate(blocks_needed):
            arrs = [ins[a * nblk + k][0, 0, :, :] for a in range(n_arr)]
            if dyb == 1:
                arrs[1] = arrs[1] + jnp.where(ypid == nyb - 1, Ly, 0.0)
            elif dyb == -1:
                arrs[1] = arrs[1] + jnp.where(ypid == 0, -Ly, 0.0)
            if dz == 1:
                arrs[2] = arrs[2] + jnp.where(zpid == nz - 1, Lz, 0.0)
            blocks[(dz, dyb)] = arrs

        home = blocks[(0, 0)]
        grp = {
            g: [jnp.zeros((cap, nlane), jnp.float32) for _ in range(n_out)]
            for g in REACTION_GROUPS
        }
        homeacc = [
            jnp.zeros((cap, nlane), jnp.float32) for _ in range(n_out)
        ]

        if S:
            sblk = ins[nblk * n_arr][:, :, :]  # [n_arr + 1, S, nlane]
            sx = sblk[0][None, :, :]
            sy = sblk[1][None, :, :]
            sz = sblk[2][None, :, :]
            ch_s = [sblk[3 + c][None, :, :] for c in range(n_chan)]
            sval = sblk[n_arr][None, :, :] > 0.5
            saccs = [
                jnp.zeros((S, nlane), jnp.float32) for _ in range(n_out)
            ]

        def hslice(a, h0):
            return jax.lax.slice_in_dim(a, h0, h0 + home_chunk, axis=0)

        for h0 in range(0, cap, home_chunk):
            hs = slice(h0, h0 + home_chunk)
            xi_ = hslice(home[0], h0)[:, None, :]
            yi_ = hslice(home[1], h0)[:, None, :]
            zi_ = hslice(home[2], h0)[:, None, :]
            ch_i = [
                hslice(home[3 + c], h0)[:, None, :] for c in range(n_chan)
            ]
            accs = [
                jnp.zeros((home_chunk, nlane), jnp.float32)
                for _ in range(n_out)
            ]

            # ---- self block: full all-pairs, fwd only
            dxv = home[0][None, :, :] - xi_
            dyv = home[1][None, :, :] - yi_
            dzv = home[2][None, :, :] - zi_
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            ch_j = [home[3 + c][None, :, :] for c in range(n_chan)]
            fwd, _ = pair_both_fn(r2, dxv, dyv, dzv, ch_i, ch_j)
            for o in range(n_out):
                accs[o] = accs[o] + jnp.sum(fwd[o], axis=1)

            # ---- positive offsets: compute once, route the reverse back
            for (dz, dy, dx) in POS_OFFSETS:
                infold = consts[("infold", dy)]
                sgn = 0 if dy == 0 else (1 if dy > 0 else -1)
                src_self = blocks[(dz, 0)]
                src_nbr = blocks[(dz, sgn)] if sgn != 0 else src_self
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

                dxv = cand[0][None, :, :] - xi_
                dyv = cand[1][None, :, :] - yi_
                dzv = cand[2][None, :, :] - zi_
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                ch_j = [cand[3 + c][None, :, :] for c in range(n_chan)]
                fwd, bwd = pair_both_fn(r2, dxv, dyv, dzv, ch_i, ch_j)
                for o in range(n_out):
                    accs[o] = accs[o] + jnp.sum(fwd[o], axis=1)
                    # reverse contribution on the candidates, reduced over
                    # the home chunk, still in home-lane coordinates
                    r = jnp.sum(bwd[o], axis=0)
                    if sgn != 0:
                        rin = _shift_lanes(
                            jnp.where(infold, r, 0.0), -s_in, interpret
                        )
                        rout = _shift_lanes(
                            jnp.where(infold, 0.0, r), -s_out, interpret
                        )
                        if dz == 0:
                            homeacc[o] = homeacc[o] + rin
                        else:
                            grp[(dz, 0)][o] = grp[(dz, 0)][o] + rin
                        grp[(dz, sgn)][o] = grp[(dz, sgn)][o] + rout
                    else:
                        rin = _shift_lanes(r, -s_in, interpret)
                        if dz == 0:
                            homeacc[o] = homeacc[o] + rin
                        else:
                            grp[(dz, 0)][o] = grp[(dz, 0)][o] + rin

            # ---- straggler broadcast block (both directions, min image)
            if S:
                dxv = sx - xi_
                dyv = sy - yi_
                dzv = sz - zi_
                dxv = dxv - Lx * jnp.round(dxv * iLx)
                dyv = dyv - Ly * jnp.round(dyv * iLy)
                dzv = dzv - Lz * jnp.round(dzv * iLz)
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                ok = sval & (xi_ < np.float32(1.0e8))
                r2m = jnp.where(ok, r2, np.float32(1.0e18))
                fwd, bwd = pair_both_fn(r2m, dxv, dyv, dzv, ch_i, ch_s)
                for o in range(n_out):
                    accs[o] = accs[o] + jnp.sum(fwd[o], axis=1)
                    saccs[o] = saccs[o] + jnp.sum(bwd[o], axis=0)

            for o in range(n_out):
                outs[o][0, 0, hs, :] = accs[o]

        # home-targeted reverse contributions + group writes (full cap)
        for o in range(n_out):
            outs[o][0, 0, :, :] = outs[o][0, 0, :, :] + homeacc[o]
        k = n_out
        for gkey in REACTION_GROUPS:
            for o in range(n_out):
                outs[k][0, 0, :, :] = grp[gkey][o]
                k += 1
        if S:
            for o in range(n_out):
                outs[k][0, 0, :, :] = saccs[o]
                k += 1

    def block_spec(dz, dyb):
        return pl.BlockSpec(
            (1, 1, cap, nlane),
            functools.partial(_blk_index, dz=dz, dyb=dyb, nz=nz, nyb=nyb),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        block_spec(dz, dyb)
        for _ in range(n_arr)
        for (dz, dyb) in blocks_needed
    ]
    if S:
        in_specs.append(
            pl.BlockSpec(
                (n_arr + 1, S, nlane), lambda z, yb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (1, 1, cap, nlane), lambda z, yb: (z, yb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [out_spec] * (5 * n_out)
    out_shape = [
        jax.ShapeDtypeStruct((nz, nyb, cap, nlane), jnp.float32)
    ] * (5 * n_out)
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
        flops=nz * nyb * (14 * cap + 2 * S) * cap * nlane
        * (20 + 6 * n_chan),
        bytes_accessed=nz * nyb * (nblk * n_arr + n_raw) * bytes_per_block,
        transcendentals=0,
    )

    fold = (
        make_fold_kernel_n(spec, n_out, interpret=interpret)
        if fold_in_pallas else None
    )

    @jax.jit
    def apply(x, y, z, *channels, strag=None):
        assert len(channels) == n_chan
        arrs = [x, y, z, *channels]
        args = [arrs[i // nblk] for i in range(nblk * n_arr)]
        if S:
            assert strag is not None
            args.append(strag)
        raw = pl.pallas_call(
            kernel,
            grid=(nz, nyb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        home = raw[:n_out]
        groups = [
            raw[n_out * (1 + gi): n_out * (2 + gi)] for gi in range(4)
        ]
        if fold is not None:
            folded = fold(home, groups)
        else:
            folded = fold_reactions_n_jnp(home, groups)
        if S:
            return tuple(folded) + tuple(raw[5 * n_out:])
        return tuple(folded)

    return apply
