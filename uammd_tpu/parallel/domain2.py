"""Domain decomposition of the PRODUCTION v2 MD engine (engine/md2.py).

Round-4's DD path (parallel/domain.py) ran the v1 27-offset kernel; this
module shards the v2 engine itself — Newton's-third-law pair kernel with
straggler side lists (engine/kernel2.py) + the Gronbech-Jensen update — so
the per-chip work of the sharded program IS the single-chip production
work. The reference has no multi-GPU analog (SURVEY 2.6); the single-GPU
bar it sets is that *everything* runs at full speed inside forwardTime
(reference: examples/misc/benchmark.cu:8, src/Interactor/PairForces.cuh:23).

Design (z-slab mesh, axis "z"):

- **One ghost row, true cross-shard Newton.** The Newton kernel enumerates
  only the self block + 13 lexicographically-positive offsets, so a shard
  needs candidates only at z+1: the up neighbor's first home row, fetched
  with one ppermute and passed to the kernel as three [1, nyb, CAP, NLANE]
  side inputs (kernel2 halo_z mode). Boundary pairs are computed ONCE, on
  the lower shard; the equal-and-opposite reactions it accumulates onto
  the ghost row (the (1, dyb) group rows at z = nz_loc - 1) are ppermuted
  up and enter the neighbor's fold as its row-0 recv (make_fold_kernel_halo).
  Per-program kernel work is identical to single chip — the halo cost is
  one row of position traffic down and one row of reaction traffic up.

- **Stragglers stay shard-local.** Each shard keeps its own [S] side list
  (particles past CAP in its slab's cells). The pair kernel's broadcast
  pass covers own-stragglers x own-cells exactly as on a single chip; the
  two boundary interactions are tiny explicit XLA passes: neighbor
  straggler lists (one ppermute each way) against my boundary cell row,
  with the resulting partial forces routed back. Straggler-straggler
  pairs run over own + neighbor lists (O((3S)^2), minimum image).

- **Drift-synchronized rebin** (reference half-skin criterion,
  VerletListBase.cuh:56-70): the fused update returns the max per-axis
  drift; pmax makes the lax.cond predicate uniform. On a 1-device mesh
  the rebin is the production separable Pallas rebin (rebin_kernel); on
  multi-device meshes it is the two-sort binning over home slots + both
  neighbor boundary rows + own/neighbor straggler lists (each particle is
  claimed by exactly one shard; a psum count audit latches ovf).

The 1-device mesh configuration measures the halo-machinery overhead
against the plain single-chip engine on real hardware (scripts/probe_dd2.py,
docs/PERF.md round-5).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.kernel2 import (
    fold_reactions_halo_jnp,
    make_fold_kernel_halo,
    make_newton_pair_kernel,
)
from ..engine.layout import (
    EMPTY_POS,
    GridSpec,
    GridState,
    _bin_columns,
    choose_spec,
)
from ..engine.md import lj_g, lj_g_fused
from ..engine.update_kernel import gj_update_jnp, make_gj_update_kernel

_SEED_STRIDE = 99999989  # per-shard spacing of the fused-update PRNG seed


def make_domain_md2_step(
    mesh: Mesh,
    spec: GridSpec,
    *,
    dt: float,
    temperature: float,
    friction: float = 1.0,
    mass: float = 1.0,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    fast_recip: bool = False,
    axis: str = "z",
    interpret: bool | None = None,
    n_total: int | None = None,
    g_fn=None,
    g_fn_kernel=None,
):
    """Build the sharded v2 MD step. ``spec`` is the GLOBAL grid spec
    (shape[2] must divide the mesh; spec.n_strag is the PER-SHARD straggler
    budget). Returns (jitted step over the 21-tuple state, state sharding
    helper info). Use ``shard_md2_state`` to build the state tuple from a
    single-chip GridState.
    """
    n_dev = mesh.devices.size
    nx, ny, nz = spec.shape
    assert nz % n_dev == 0, "nz must divide the mesh for z-sharding"
    nz_loc = nz // n_dev
    assert n_dev == 1 or nz_loc >= 2, "need >= 2 cell rows per shard"
    S = spec.n_strag
    Lz = np.float32(spec.box_size[2])
    Ls = tuple(float(v) for v in spec.box_size)
    rc2 = np.float32(spec.cutoff * spec.cutoff)
    thr = np.float32(spec.drift_threshold)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if g_fn is None:
        g_fn = lj_g(epsilon, sigma)
    if g_fn_kernel is None:
        g_fn_kernel = lj_g_fused(
            epsilon, sigma, rc2=spec.cutoff * spec.cutoff,
            approx=bool(fast_recip and not interpret),
        )

    local_spec = dataclasses.replace(spec, shape=(nx, ny, nz_loc))
    kern = make_newton_pair_kernel(
        local_spec, g_fn_kernel, interpret=interpret, halo_z=True,
        self_half=not interpret,
    )
    fold = (
        make_fold_kernel_halo(local_spec, interpret=interpret)
        if not interpret else None
    )
    upd = (
        make_gj_update_kernel(local_spec, dt, temperature, friction, mass)
        if not interpret else None
    )

    # integrator constants (G-J; engine/update_kernel.py)
    dt_ = np.float32(dt)
    hv = np.float32(0.5 * dt / mass)
    gdt = 0.5 * friction * dt
    bco = np.float32(1.0 / (1.0 + gdt))
    aco = np.float32((1.0 - gdt) * bco)
    c_x = np.float32(0.5 * bco * dt / mass)
    amp = np.float32(
        math.sqrt(2.0 * temperature * friction * mass * dt)
        if temperature > 0 else 0.0
    )

    def perm_up():
        # each shard SENDS to i+1 (receives from its down neighbor)
        return [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def perm_dn():
        # each shard SENDS to i-1 (receives from its up neighbor)
        return [(i, (i - 1) % n_dev) for i in range(n_dev)]

    # Attribution knob for the 1-device-mesh halo measurement
    # (scripts/probe_dd2.py): on a 1-ring every ppermute is the identity,
    # so skipping the collective changes nothing numerically but separates
    # the STRUCTURAL halo cost (ghost selects, boundary reaction fold)
    # from the per-collective cost of the platform (the axon tunnel's
    # collective-permute is ~1000x an ICI hop).
    import os as _os

    _skip_collectives = n_dev == 1 and bool(
        int(_os.environ.get("UAMMD_DD_LOCAL_HALO", "0"))
    )

    def _perm(a, perm):
        if _skip_collectives:
            return a
        return jax.lax.ppermute(a, axis, perm)

    def ghost_rows(x, y, z):
        """Up neighbor's first home row, z image-shifted at the wrap.
        One batched ppermute for all three coordinates (collective count
        per step matters: the halo cost IS the per-step ppermutes)."""
        g = _perm(jnp.stack([x[:1], y[:1], z[:1]]), perm_dn())
        idx = jax.lax.axis_index(axis)
        gz = g[2] + jnp.where(idx == n_dev - 1, Lz, 0.0)
        return g[0], g[1], gz

    def strag_row_pass(xr, yr, zr, slist, sval):
        """Foreign stragglers x one boundary cell row (plain XLA; tiny).
        Returns (row force add [3, nyb, cap, nlane], partial on the
        stragglers [S, 3])."""
        sx = slist[:, 0][:, None, None, None]
        sy = slist[:, 1][:, None, None, None]
        sz = slist[:, 2][:, None, None, None]
        dxv = sx - xr[None]
        dyv = sy - yr[None]
        dzv = sz - zr[None]
        dxv = dxv - np.float32(Ls[0]) * jnp.round(dxv / np.float32(Ls[0]))
        dyv = dyv - np.float32(Ls[1]) * jnp.round(dyv / np.float32(Ls[1]))
        dzv = dzv - np.float32(Ls[2]) * jnp.round(dzv / np.float32(Ls[2]))
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ok = (r2 < rc2) & sval[:, None, None, None] & (xr[None] < 1.0e8)
        g = jnp.where(ok, g_fn(jnp.maximum(r2, np.float32(4e-3))), 0.0)
        tx, ty, tz = g * dxv, g * dyv, g * dzv
        f_row = jnp.stack(
            [jnp.sum(tx, axis=0), jnp.sum(ty, axis=0), jnp.sum(tz, axis=0)]
        )
        part = jnp.stack(
            [-jnp.sum(tx, axis=(1, 2, 3)), -jnp.sum(ty, axis=(1, 2, 3)),
             -jnp.sum(tz, axis=(1, 2, 3))], axis=-1,
        )
        return f_row, part

    def ss_forces(own, own_val, comb, comb_val):
        """Straggler-straggler forces on the own rows (minimum image)."""
        d = comb[None, :, :] - own[:, None, :]
        d = d - jnp.asarray(Ls, jnp.float32) * jnp.round(
            d / jnp.asarray(Ls, jnp.float32)
        )
        r2 = jnp.sum(d * d, axis=-1)
        ok = (
            (r2 < rc2) & (r2 > 1e-10)
            & own_val[:, None] & comb_val[None, :]
        )
        g = jnp.where(ok, g_fn(jnp.maximum(r2, np.float32(4e-3))), 0.0)
        return jnp.sum(g[:, :, None] * d, axis=1)

    def broadcast_block(spos, sval):
        stack = jnp.stack(
            [spos[:, 0], spos[:, 1], spos[:, 2],
             sval.astype(jnp.float32)]
        )
        return jnp.broadcast_to(stack[:, :, None], (4, S, local_spec.nlane))

    def compute_forces(x, y, z, pidf, spos, spidf):
        mask = (pidf > 0.5).astype(x.dtype)
        sval = spidf > 0.5
        gx, gy, gz = ghost_rows(x, y, z)
        args = (x, y, z, gx, gy, gz)
        if S:
            args = args + (broadcast_block(spos, sval),)
        outs = kern(*args)
        home = outs[0:3]
        groups = [outs[3 + 3 * i: 6 + 3 * i] for i in range(4)]
        # reactions targeting my ghost row belong to the UP neighbor
        # (one batched ppermute for the 9 group-component rows)
        sends = jnp.stack(
            [g[c][nz_loc - 1] for g in groups[:3] for c in range(3)]
        )
        rec = _perm(sends, perm_up())
        recvs = [rec[i][None] for i in range(9)]
        if fold is not None:
            fx, fy, fz = fold(home, groups, recvs)
        else:
            fx, fy, fz = fold_reactions_halo_jnp(home, groups, recvs)
        if S:
            sf = jnp.stack(
                [jnp.sum(outs[15 + c], axis=(0, 1, 3)) for c in range(3)],
                axis=-1,
            )
            if n_dev > 1:
                sl = jnp.stack([spos[:, 0], spos[:, 1], spos[:, 2],
                                spidf], axis=-1)
                dn_l = jax.lax.ppermute(sl, axis, perm_up())
                up_l = jax.lax.ppermute(sl, axis, perm_dn())
                f0, p_dn = strag_row_pass(
                    x[0], y[0], z[0], dn_l[:, :3], dn_l[:, 3] > 0.5
                )
                fT, p_up = strag_row_pass(
                    x[nz_loc - 1], y[nz_loc - 1], z[nz_loc - 1],
                    up_l[:, :3], up_l[:, 3] > 0.5,
                )
                fx = fx.at[0].add(f0[0]).at[nz_loc - 1].add(fT[0])
                fy = fy.at[0].add(f0[1]).at[nz_loc - 1].add(fT[1])
                fz = fz.at[0].add(f0[2]).at[nz_loc - 1].add(fT[2])
                sf = sf + jax.lax.ppermute(p_dn, axis, perm_dn())
                sf = sf + jax.lax.ppermute(p_up, axis, perm_up())
                if n_dev > 2:
                    comb = jnp.concatenate([sl, dn_l, up_l])
                else:
                    comb = jnp.concatenate([sl, dn_l])
                sf = sf + ss_forces(
                    spos, sval, comb[:, :3], comb[:, 3] > 0.5
                )
            else:
                sf = sf + ss_forces(spos, sval, spos, sval)
            sf = sf * sval[:, None]
        else:
            sf = jnp.zeros((S, 3), jnp.float32)
        return fx * mask, fy * mask, fz * mask, sf

    def strag_update(spos, svelw, sforce, spidf, key):
        m = (spidf > 0.5)[:, None]
        if temperature > 0:
            noise = amp * jax.random.normal(key, (S, 3), jnp.float32)
        else:
            noise = jnp.zeros((S, 3), jnp.float32)
        v = svelw + hv * sforce
        spos2 = spos + m * (bco * dt_ * v + c_x * (dt_ * sforce + noise))
        svelw2 = m * (
            aco * v + hv * aco * sforce
            + (bco / np.float32(mass)) * noise
        )
        return spos2, svelw2

    ncell_loc = nz_loc * local_spec.nyb * local_spec.nlane

    def cell_of(p, L, ncell):
        frac = p / np.float32(L) + 0.5
        frac = frac - jnp.floor(frac)
        return jnp.clip((frac * ncell).astype(jnp.int32), 0, ncell - 1)

    def sort_rebin(x, y, z, wx, wy, wz, pidf, spos, svelw, spidf):
        """Two-sort rebin with cross-shard migration + straggler side list."""
        st = jnp.stack([x, y, z, wx, wy, wz, pidf])
        pools = [st.reshape(7, -1)]
        slists = [jnp.stack(
            [spos[:, 0], spos[:, 1], spos[:, 2],
             svelw[:, 0], svelw[:, 1], svelw[:, 2], spidf]
        )]
        if n_dev > 1:
            from_dn = jax.lax.ppermute(st[:, -1:], axis, perm_up())
            from_up = jax.lax.ppermute(st[:, :1], axis, perm_dn())
            pools += [from_dn.reshape(7, -1), from_up.reshape(7, -1)]
            dn_s = jax.lax.ppermute(slists[0], axis, perm_up())
            slists.append(dn_s)
            if n_dev > 2:
                up_s = jax.lax.ppermute(slists[0], axis, perm_dn())
                slists.append(up_s)
        pool = jnp.concatenate(pools + slists, axis=1)
        valid = pool[6] > 0.5
        xw = jnp.where(
            valid, pool[0] - np.float32(Ls[0]) * jnp.round(pool[0] / np.float32(Ls[0])),
            EMPTY_POS)
        yw = jnp.where(
            valid, pool[1] - np.float32(Ls[1]) * jnp.round(pool[1] / np.float32(Ls[1])),
            EMPTY_POS)
        zw = jnp.where(
            valid, pool[2] - np.float32(Ls[2]) * jnp.round(pool[2] / np.float32(Ls[2])),
            EMPTY_POS)
        cx = cell_of(xw, Ls[0], nx)
        cy = cell_of(yw, Ls[1], ny)
        cz = cell_of(zw, Ls[2], nz)
        z0 = jax.lax.axis_index(axis) * nz_loc
        mine = valid & (cz >= z0) & (cz < z0 + nz_loc)
        F = spec.fold
        yb = cy // F
        lane = cx * F + (cy - yb * F)
        key = ((cz - z0) * local_spec.nyb + yb) * local_spec.nlane + lane
        key = jnp.where(mine, key, ncell_loc)
        cols = (xw, yw, zw, pool[3], pool[4], pool[5], pool[6])
        fills = (None, None, None, 0.0, 0.0, 0.0, 0.0)
        binned, strag, ovf = _bin_columns(
            local_spec, key, cols, 0, fills=fills
        )
        count = (
            jnp.sum((binned[6] > 0.5).astype(jnp.int32))
            + jnp.sum((strag[6] > 0.5).astype(jnp.int32))
        )
        total = jax.lax.psum(count, axis)
        o = ovf.astype(jnp.float32)
        if n_total is not None:
            o = o + (total != n_total).astype(jnp.float32)
        spos2 = jnp.stack(strag[0:3], axis=-1)
        svelw2 = jnp.stack(strag[3:6], axis=-1)
        spidf2 = strag[6]
        return (
            binned[0], binned[1], binned[2],
            binned[3], binned[4], binned[5], binned[6],
            spos2, svelw2, spidf2, o,
        )

    _fast_rebin = [None]

    def fast_rebin_1dev(x, y, z, wx, wy, wz, pidf, spos, svelw, spidf):
        """Production separable Pallas rebin (only valid when the local
        grid IS the global grid, i.e. a 1-device mesh)."""
        from ..engine.rebin_kernel import _compact_mini, make_separable_rebin

        if _fast_rebin[0] is None:
            _fast_rebin[0] = make_separable_rebin(
                local_spec, 7, interpret=interpret
            )
        stacked = jnp.stack([x, y, z, wx, wy, wz, pidf])
        sstack = jnp.stack(
            [spos[:, 0], spos[:, 1], spos[:, 2],
             svelw[:, 0], svelw[:, 1], svelw[:, 2], spidf]
        )
        sstack = jnp.broadcast_to(
            sstack[:, :, None], (7, S, local_spec.nlane)
        )
        out, mini, count, ovf = _fast_rebin[0](stacked, sstack)
        spos2, svelw2, spid2, s_count = _compact_mini(
            mini, S, n_total if n_total is not None else 0
        )
        o = (ovf > 0).astype(jnp.float32) + (s_count > S).astype(jnp.float32)
        if n_total is not None:
            o = o + (count.astype(jnp.int32) != n_total).astype(jnp.float32)
        return (
            out[0], out[1], out[2], out[3], out[4], out[5], out[6],
            spos2, svelw2, (spid2 + 1).astype(jnp.float32), o,
        )

    use_fast_rebin = (n_dev == 1 and S > 0 and not interpret)

    def step_shard(x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, pidf,
                   spos, svelw, sforce, spidf, sref, ovf, stepc, key_data):
        key = jax.random.wrap_key_data(key_data[0])
        key, k_upd, k_strag = jax.random.split(key, 3)
        if upd is not None:
            (x, y, z, wx, wy, wz), dinf = upd(
                x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, stepc[0]
            )
        else:
            (x, y, z, wx, wy, wz), dinf = gj_update_jnp(
                local_spec, dt, temperature, friction, mass,
                x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, k_upd,
            )
        if S:
            spos, svelw = strag_update(spos, svelw, sforce, spidf, k_strag)
            sm = (spidf > 0.5)[:, None]
            sdrift = jnp.max(
                jnp.where(sm, jnp.abs(spos - sref), 0.0)
            )
            dinf = jnp.maximum(dinf, sdrift)
        drift = jax.lax.pmax(dinf, axis)

        rebin_fn = fast_rebin_1dev if use_fast_rebin else sort_rebin

        def do_rebin(args):
            (x, y, z, wx, wy, wz, pidf, spos, svelw, spidf, ovf) = args
            out = rebin_fn(x, y, z, wx, wy, wz, pidf, spos, svelw, spidf)
            (x2, y2, z2, wx2, wy2, wz2, pidf2,
             spos2, svelw2, spidf2, o) = out
            return (x2, y2, z2, wx2, wy2, wz2, pidf2,
                    spos2, svelw2, spidf2, ovf + o)

        (x, y, z, wx, wy, wz, pidf, spos, svelw, spidf, ovf) = jax.lax.cond(
            drift > thr, do_rebin, lambda a: a,
            (x, y, z, wx, wy, wz, pidf, spos, svelw, spidf, ovf),
        )
        rx = jnp.where(drift > thr, x, rx)
        ry = jnp.where(drift > thr, y, ry)
        rz = jnp.where(drift > thr, z, rz)
        sref = jnp.where(drift > thr, spos, sref)

        fx, fy, fz, sforce = compute_forces(x, y, z, pidf, spos, spidf)
        return (x, y, z, wx, wy, wz, fx, fy, fz, rx, ry, rz, pidf,
                spos, svelw, sforce, spidf, sref, ovf, stepc + 1,
                jax.random.key_data(key)[None])

    gspec = P(axis)
    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(gspec,) * 21,
        out_specs=(gspec,) * 21,
        check_vma=False,
    )
    sharding = NamedSharding(mesh, gspec)
    return jax.jit(step), sharding


def shard_md2_state(md, gs: GridState, mesh: Mesh, axis: str = "z",
                    seed: int = 0):
    """Single-chip GridState (from GridMD2.init) -> the 21-tuple consumed
    by make_domain_md2_step. Forces are folded; stragglers are routed to
    the shard owning their cell's z-slab (per-shard budget = spec.n_strag).
    """
    spec = gs.spec
    n_dev = mesh.devices.size
    nz = spec.shape[2]
    nz_loc = nz // n_dev
    S = spec.n_strag
    sharding = NamedSharding(mesh, P(axis))
    ffx, ffy, ffz = md.folded_forces(gs)
    mask = (gs.pid >= 0).astype(jnp.float32)
    pidf = (gs.pid + 1).astype(jnp.float32)
    grid_arrays = [
        jax.device_put(a, sharding)
        for a in (gs.x, gs.y, gs.z, gs.vx, gs.vy, gs.vz,
                  ffx * mask, ffy * mask, ffz * mask,
                  gs.ref_x, gs.ref_y, gs.ref_z, pidf)
    ]
    # distribute stragglers to their slab's shard (host side)
    spos = np.asarray(gs.spos)
    svel = np.asarray(gs.svel)
    sforce = np.asarray(gs.sforce)
    spid = np.asarray(gs.spid)
    Lz = spec.box_size[2]
    spos_s = np.full((n_dev, S, 3), EMPTY_POS, np.float32)
    svel_s = np.zeros((n_dev, S, 3), np.float32)
    sf_s = np.zeros((n_dev, S, 3), np.float32)
    spidf_s = np.zeros((n_dev, S), np.float32)
    fill = [0] * n_dev
    for r in range(S):
        if spid[r] < 0:
            continue
        frac = (spos[r, 2] / Lz + 0.5) % 1.0
        cz = min(int(frac * nz), nz - 1)
        sh = cz // nz_loc
        k = fill[sh]
        if k >= S:
            raise ValueError("per-shard straggler budget exceeded at init")
        spos_s[sh, k] = spos[r]
        svel_s[sh, k] = svel[r]
        sf_s[sh, k] = sforce[r]
        spidf_s[sh, k] = float(spid[r] + 1)
        fill[sh] = k + 1
    strag_arrays = [
        jax.device_put(jnp.asarray(a.reshape(n_dev * S, *a.shape[2:])),
                       sharding)
        for a in (spos_s, svel_s, sf_s, spidf_s)
    ]
    sref = jax.device_put(
        jnp.asarray(spos_s.reshape(n_dev * S, 3)), sharding
    )
    ovf = jax.device_put(jnp.zeros((n_dev,), jnp.float32), sharding)
    base = int((seed * 2654435761 + 12345) % (1 << 31))
    seeds = (np.arange(n_dev, dtype=np.int64) * _SEED_STRIDE + base) % (
        1 << 31
    )
    stepc = jax.device_put(
        jnp.asarray(seeds.astype(np.int32)), sharding
    )
    keys = jax.vmap(jax.random.key_data)(
        jax.random.split(jax.random.key(seed), n_dev)
    )
    keys = jax.device_put(keys, sharding)
    return tuple(grid_arrays) + tuple(strag_arrays) + (
        sref, ovf, stepc, keys
    )


def gather_md2_state(state, spec: GridSpec, n: int):
    """DD state tuple -> (pos [N, 3], velw [N, 3]) in pid order (host)."""
    x, y, z, wx, wy, wz = (np.asarray(a) for a in state[0:6])
    pidf = np.asarray(state[12])
    spos = np.asarray(state[13])
    svelw = np.asarray(state[14])
    spidf = np.asarray(state[16])
    pid = np.rint(pidf).astype(np.int64).reshape(-1) - 1
    cols = np.stack(
        [a.reshape(-1) for a in (x, y, z, wx, wy, wz)], axis=-1
    )
    spid = np.rint(spidf).astype(np.int64) - 1
    scols = np.concatenate([spos, svelw], axis=-1)
    allpid = np.concatenate([pid, spid])
    allcols = np.concatenate([cols, scols], axis=0)
    keep = allpid >= 0
    order = allpid[keep]
    vals = allcols[keep]
    out = np.zeros((n, 6), np.float32)
    out[order] = vals
    return out[:, :3], out[:, 3:]


def make_lj_domain2(
    mesh: Mesh,
    box_size,
    n: int,
    *,
    epsilon: float = 1.0,
    sigma: float = 1.0,
    cutoff: float = 2.5,
    skin: float = 1.2,
    dt: float = 0.01,
    temperature: float = 1.0,
    friction: float = 1.0,
    mass: float = 1.0,
    cap: int | None = None,
    n_strag: int = 32,
    pos=None,
    fast_recip: bool = False,
    interpret: bool | None = None,
    axis: str = "z",
    seed: int = 0,
):
    """Full setup on the reference benchmark system: returns
    (step_fn, state_tuple, spec, single-chip GridMD2 used for init)."""
    from ..engine.md2 import make_lj_md2

    n_dev = mesh.devices.size
    spec = choose_spec(
        box_size, n, cutoff, skin=skin, cap=cap, pos=pos,
        n_strag=n_strag, nz_multiple=max(n_dev, 1),
    )
    md = _single_chip_md2(
        spec, epsilon, sigma, dt, temperature, friction, mass,
        fast_recip, interpret,
    )
    if pos is None:
        raise ValueError("pass initial positions (pos=[N,3])")
    gs = md.init(jnp.asarray(pos, jnp.float32), seed=seed)
    step, _ = make_domain_md2_step(
        mesh, spec, dt=dt, temperature=temperature, friction=friction,
        mass=mass, epsilon=epsilon, sigma=sigma, fast_recip=fast_recip,
        axis=axis, interpret=interpret, n_total=n,
    )
    state = shard_md2_state(md, gs, mesh, axis=axis, seed=seed)
    return step, state, spec, md


def _single_chip_md2(spec, epsilon, sigma, dt, temperature, friction, mass,
                     fast_recip, interpret):
    from ..engine.md2 import GridMD2

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gk = lj_g_fused(
        epsilon, sigma, rc2=spec.cutoff * spec.cutoff,
        approx=bool(fast_recip and not interpret),
    )
    return GridMD2.create(
        spec, lj_g(epsilon, sigma), dt=dt, temperature=temperature,
        friction=friction, mass=mass, interpret=interpret, g_fn_kernel=gk,
        fold_in_update=False,
        self_half=not interpret, strag_cellcenter=False,
    )
