"""Composed multi-chip PSE v2: persistent sharded state, no replicated O(N).

Round-4's composed step (parallel/pse_dd.py) proved the composition but ran
two O(N) stages replicated on every chip (the slot pack and the far-field
x-binning) and required a straggler-free near grid (CAP = max occupancy).
This version closes VERDICT-r4 missing #2:

- **The near grid IS the state.** Positions live in the z-slab-sharded slot
  arrays (plus per-shard straggler side lists) across steps, exactly like
  the DD MD engine (parallel/domain2.py); the EM update moves slots in
  place and a drift-triggered SHARD-LOCAL rebin (two-sort over own slots +
  neighbor boundary rows + own/neighbor straggler lists, psum count audit)
  replaces the per-step replicated pack. No [N]-order position array
  exists anywhere in the step.

- **Straggler rows** (spec.n_strag > 0, per shard): the near channel
  kernel's broadcast pass takes the COMBINED own + neighbor straggler
  lists (minimum image; each grid-straggler pair lands exactly once on the
  grid particle's shard), partial forces on foreign stragglers are routed
  home with the reverse ppermute, and straggler-straggler terms run over
  the combined list. The Lanczos Krylov vectors carry the straggler rows
  as a per-shard tail — the distributed sqrt(M) covers them too.

- **The far binning is an all-to-all redistribution,** not a replicated
  sort: each z-shard bins ITS OWN particles by x-slab owner into fixed
  [D, m2] buckets (two-sort, shard-local, O(N/D log N/D)), one
  all_to_all ships them to the x-shards of the distributed spectral far
  field (parallel/spectral.make_sharded_fcm_mf), and the far velocities
  ride the reverse all_to_all back to the slot owners (bucket tags never
  leave their shard). Bucket overflow latches ovf.

Reference shape: src/Integrator/BDHI/BDHI_EulerMaruyama.cu:125-166 +
PSE near/far split (BDHI_PSE.cuh:20-55). The multi-chip layer itself has
no reference counterpart (SURVEY 2.6).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.layout import EMPTY_POS, _bin_columns, pack_channels
from ..engine.pair_kernel import make_pair_channel_kernel
from .pse_dd import lanczos_sqrt_apply_dd


def make_sharded_pse_em_step2(
    mesh: Mesh,
    be,
    *,
    g_pair,
    dt: float,
    temperature: float,
    n: int,
    far_m2: int | None = None,
    axis: str = "d",
    interpret: bool | None = None,
    g_pair_kernel=None,
):
    """Build (step, make_state):

    - ``step(state, key) -> state`` — one EM step, fully sharded.
    - ``make_state(pos) -> state`` — initial sharded state from [N, 3]
      positions (host-side; off the hot path).

    ``be`` is a PSEGrid whose spec was created with ``nz_multiple = D`` and
    ``n_strag = S`` (S is the PER-SHARD straggler budget). ``g_pair`` is
    the short-range engine radial (e.g. WCA via md.lj_g_fused) and must be
    jnp-evaluable (approx=False) — it runs outside Pallas in the
    straggler-straggler pass; ``g_pair_kernel`` (default: ``g_pair``) is
    the variant used inside the Pallas channel kernels, where the TPU
    approximate reciprocal (approx=True) is legal.
    State tuple (z-sharded on the leading axis): (x, y, z, pidf, rx, ry,
    rz, spos, spidf, sref, ovf, n_rebin).
    """
    from .spectral import make_sharded_fcm_mf

    spec = be.spec
    S = spec.n_strag
    assert S > 0, "v2 composed PSE runs the straggler near grid (S > 0)"
    D = mesh.devices.size
    nx, ny, nz = spec.shape
    assert nz % D == 0, "near-grid nz must divide the mesh"
    nz_loc = nz // D
    assert D == 1 or nz_loc >= 2
    nyb, cap, nlane = spec.nyb, spec.cap, spec.nlane
    Ls = tuple(float(v) for v in spec.box_size)
    Lz = np.float32(Ls[2])
    sf = np.float32(be.self_f)
    thr = np.float32(spec.drift_threshold)
    amp = math.sqrt(2.0 * temperature / dt) if temperature > 0 else 0.0
    noisy = temperature > 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if g_pair_kernel is None:
        g_pair_kernel = g_pair

    n_comb = S if D == 1 else (2 * S if D == 2 else 3 * S)
    # kernels on the halo-extended local slab [nz_loc + 2, ...]; their
    # straggler broadcast carries the COMBINED own+neighbor lists
    local_spec = dataclasses.replace(
        spec, shape=(nx, ny, nz_loc + 2), n_strag=n_comb
    )
    pf, pbf = be._pair_fn()
    nkern = make_pair_channel_kernel(
        local_spec, pf, 3, 3, pair_both_fn=pbf,
        interpret=interpret, periodic_z=False,
    )

    def pair_force_fn(r2, dxv, dyv, dzv, ch_i, ch_j):
        g = g_pair_kernel(r2)
        return (g * dxv, g * dyv, g * dzv)

    def pair_force_both(r2, dxv, dyv, dzv, ch_i, ch_j):
        g = g_pair_kernel(r2)
        return (g * dxv, g * dyv, g * dzv), (-g * dxv, -g * dyv, -g * dzv)

    fkern = make_pair_channel_kernel(
        local_spec, pair_force_fn, 0, 3, pair_both_fn=pair_force_both,
        interpret=interpret, periodic_z=False,
    )

    far = be.far
    far_mf = make_sharded_fcm_mf(
        mesh, be.box, viscosity=far.viscosity, radius=far.radius,
        shape=far.shape, support=far.support, axis=axis,
        rpy_sinc_radius=far.rpy_sinc_radius, hasimoto_k2=far.hasimoto_k2,
        noise=noisy,
    )
    if far_m2 is None:
        # per (z-shard -> x-shard) bucket capacity
        far_m2 = int(math.ceil(n / (D * D) * 2.5 / 8.0)) * 8 + 8

    slots_loc = nz_loc * nyb * cap * nlane
    m_loc = slots_loc + S  # local particle rows (slots + stragglers)

    def perm_up():
        return [(i, (i + 1) % D) for i in range(D)]

    def perm_dn():
        return [(i, (i - 1) % D) for i in range(D)]

    def halo(a, shift_lo=0.0, shift_hi=0.0):
        up = jax.lax.ppermute(a[-1:], axis, perm_up())
        down = jax.lax.ppermute(a[:1], axis, perm_dn())
        i = jax.lax.axis_index(axis)
        if shift_lo or shift_hi:
            up = up + jnp.where(i == 0, shift_lo, 0.0)
            down = down + jnp.where(i == D - 1, shift_hi, 0.0)
        return jnp.concatenate([up, a, down], axis=0)

    def combined_strag(spos, spidf):
        """Own + unique-neighbor straggler lists [n_comb, 4] (x, y, z,
        valid). Minimum image puts each grid-straggler pair on exactly one
        shard; n_dev <= 2 dedupes the aliased neighbor copies."""
        own = jnp.concatenate([spos, (spidf > 0.5)[:, None].astype(
            jnp.float32)], axis=1)
        if D == 1:
            return own
        dn = jax.lax.ppermute(own, axis, perm_up())
        if D == 2:
            return jnp.concatenate([own, dn])
        up = jax.lax.ppermute(own, axis, perm_dn())
        return jnp.concatenate([own, dn, up])

    def route_partials(part):
        """[n_comb, 3] partial forces on the combined list -> [S, 3] total
        on OWN stragglers (own segment + contributions computed on the
        neighbors, ppermuted home)."""
        tot = part[:S]
        if D == 1:
            return tot
        # my partial on the dn-neighbor's list lives in segment 1: send it
        # down; I receive the up-neighbor's partial on MY list
        tot = tot + jax.lax.ppermute(part[S:2 * S], axis, perm_dn())
        if D == 2:
            return tot
        tot = tot + jax.lax.ppermute(part[2 * S:3 * S], axis, perm_up())
        return tot

    def ss_apply(pair_eval, own, own_val, comb, comb_val, ch_own, ch_comb):
        """Straggler-straggler pair terms on own rows (minimum image)."""
        d = comb[None, :, :] - own[:, None, :]
        Lv = jnp.asarray(Ls, jnp.float32)
        d = d - Lv * jnp.round(d / Lv)
        r2 = jnp.sum(d * d, axis=-1)
        ok = own_val[:, None] & comb_val[None, :]
        # mask the self pair (own row appears in comb at identical coords)
        ok = ok & (r2 > 1e-12)
        r2m = jnp.where(ok, r2, np.float32(1.0e18))[:, :, None]
        ch_i = tuple(c[:, None, None] for c in ch_own)
        ch_j = tuple(c[None, :, None] for c in ch_comb)
        out = pair_eval(
            r2m, d[:, :, 0:1], d[:, :, 1:2], d[:, :, 2:3], ch_i, ch_j
        )
        return tuple(jnp.sum(o, axis=1)[:, 0] for o in out)

    # ---------------------------------------------------------- shard ops
    def near_and_to_far(x, y, z, pidf, rx, ry, rz, spos, spidf, sref,
                        ovf, nreb, noise_g, noise_s):
        """Rebin (on drift) + pair force + near matvec + distributed
        Lanczos noise + far-bound bucketing. Returns the post-rebin state
        pieces, slot/straggler near velocities + forces, far buckets and
        their local tags."""
        # ---- drift-triggered shard-local rebin
        mask = (pidf > 0.5)
        dinf = jnp.max(jnp.where(
            mask,
            jnp.maximum(jnp.abs(x - rx),
                        jnp.maximum(jnp.abs(y - ry), jnp.abs(z - rz))),
            0.0,
        ))
        sm = spidf > 0.5
        dinf = jnp.maximum(dinf, jnp.max(jnp.where(
            sm[:, None], jnp.abs(spos - sref), 0.0)))
        drift = jax.lax.pmax(dinf, axis)

        def do_rebin(args):
            x, y, z, pidf, spos, spidf, ovf = args
            st = jnp.stack([x, y, z, pidf])
            pools = [st.reshape(4, -1)]
            sl = jnp.concatenate(
                [spos, spidf[:, None].astype(jnp.float32)], axis=1
            ).T  # [4, S]
            slists = [sl]
            if D > 1:
                from_dn = jax.lax.ppermute(st[:, -1:], axis, perm_up())
                from_up = jax.lax.ppermute(st[:, :1], axis, perm_dn())
                pools += [from_dn.reshape(4, -1), from_up.reshape(4, -1)]
                slists.append(jax.lax.ppermute(sl, axis, perm_up()))
                if D > 2:
                    slists.append(jax.lax.ppermute(sl, axis, perm_dn()))
            pool = jnp.concatenate(pools + slists, axis=1)
            valid = pool[3] > 0.5
            Lv = [np.float32(v) for v in Ls]
            xw = jnp.where(
                valid, pool[0] - Lv[0] * jnp.round(pool[0] / Lv[0]),
                EMPTY_POS)
            yw = jnp.where(
                valid, pool[1] - Lv[1] * jnp.round(pool[1] / Lv[1]),
                EMPTY_POS)
            zw = jnp.where(
                valid, pool[2] - Lv[2] * jnp.round(pool[2] / Lv[2]),
                EMPTY_POS)

            def cell_of(p, L, ncell):
                frac = p / L + 0.5
                frac = frac - jnp.floor(frac)
                return jnp.clip((frac * ncell).astype(jnp.int32), 0,
                                ncell - 1)

            cx = cell_of(xw, Lv[0], nx)
            cy = cell_of(yw, Lv[1], ny)
            cz = cell_of(zw, Lv[2], nz)
            z0 = jax.lax.axis_index(axis) * nz_loc
            mine = valid & (cz >= z0) & (cz < z0 + nz_loc)
            F = spec.fold
            yb = cy // F
            lane = cx * F + (cy - yb * F)
            ncell_loc = nz_loc * nyb * nlane
            key = ((cz - z0) * nyb + yb) * nlane + lane
            key = jnp.where(mine, key, ncell_loc)
            rebin_spec = dataclasses.replace(
                spec, shape=(nx, ny, nz_loc)
            )
            binned, strag, o = _bin_columns(
                rebin_spec, key, (xw, yw, zw, pool[3]), 0,
                fills=(None, None, None, 0.0),
            )
            count = (
                jnp.sum((binned[3] > 0.5).astype(jnp.int32))
                + jnp.sum((strag[3] > 0.5).astype(jnp.int32))
            )
            total = jax.lax.psum(count, axis)
            o = o.astype(jnp.float32) + (total != n).astype(jnp.float32)
            spos2 = jnp.stack(strag[0:3], axis=-1)
            return (binned[0], binned[1], binned[2], binned[3],
                    spos2, strag[3], ovf + o)

        (x, y, z, pidf, spos, spidf, ovf) = jax.lax.cond(
            drift > thr, do_rebin, lambda a: a,
            (x, y, z, pidf, spos, spidf, ovf),
        )
        rebinned = drift > thr
        rx = jnp.where(rebinned, x, rx)
        ry = jnp.where(rebinned, y, ry)
        rz = jnp.where(rebinned, z, rz)
        sref = jnp.where(rebinned, spos, sref)
        nreb = nreb + rebinned.astype(jnp.int32)
        mask = (pidf > 0.5).astype(x.dtype)
        sm = spidf > 0.5

        # ---- halos + combined straggler broadcast
        xe = halo(x)
        ye = halo(y)
        ze = halo(z, shift_lo=-Lz, shift_hi=Lz)
        comb = combined_strag(spos, spidf)  # [n_comb, 4]
        comb_pos = comb[:, :3]
        comb_val = comb[:, 3] > 0.5

        def bblock(channels):
            """Broadcast block for the halo kernel: [n_arr+1, n_comb,
            nlane] (positions + channels + validity)."""
            rows = [comb_pos[:, 0], comb_pos[:, 1], comb_pos[:, 2]]
            rows += list(channels)
            rows.append(comb[:, 3])
            stack = jnp.stack(rows)
            return jnp.broadcast_to(
                stack[:, :, None], (len(rows), n_comb, nlane)
            )

        # ---- pair force (one channel-kernel pass, both directions)
        fo = fkern(xe, ye, ze, strag=bblock(()))
        fx = fo[0][1:-1] * mask
        fy = fo[1][1:-1] * mask
        fz = fo[2][1:-1] * mask
        spart = [jnp.sum(fo[3 + c][1:-1], axis=(0, 1, 3)) for c in range(3)]
        sp = route_partials(jnp.stack(spart, axis=-1))
        ssf = ss_apply(
            lambda r2, dx_, dy_, dz_, ci, cj: (
                g_pair(r2[..., 0])[..., None] * dx_,
                g_pair(r2[..., 0])[..., None] * dy_,
                g_pair(r2[..., 0])[..., None] * dz_,
            ),
            spos, sm, comb_pos, comb_val, (), (),
        )
        sforce = (sp + jnp.stack(ssf, axis=-1)) * sm[:, None]

        # ---- near matvec (+ self term) on slots + straggler rows
        def matvec(g3, sg3):
            """g3: [3, nz_loc, ...] slot vectors; sg3: [3, S] straggler
            rows. Returns the same structure."""
            outs = nkern(
                xe, ye, ze, halo(g3[0]), halo(g3[1]), halo(g3[2]),
                strag=bblock(_comb_rows(sg3)),
            )
            v = jnp.stack([
                (outs[c][1:-1] + sf * g3[c]) * mask for c in range(3)
            ])
            # partials on the combined stragglers from my HOME rows
            part = jnp.stack(
                [jnp.sum(outs[3 + c][1:-1], axis=(0, 1, 3))
                 for c in range(3)], axis=-1,
            )
            own_part = route_partials(part)
            ss = ss_apply(
                pf, spos, sm, comb_pos, comb_val,
                tuple(sg3), tuple(_comb_rows(sg3)),
            )
            sv = (own_part + jnp.stack(ss, axis=-1)
                  + sf * jnp.transpose(sg3)) * sm[:, None]
            return v, jnp.transpose(sv)

        def _comb_rows(sg3):
            """Extend own straggler channel rows to the combined list
            (neighbor channel values ppermuted alongside)."""
            own = jnp.stack(sg3)  # [3, S]
            if D == 1:
                return tuple(own)
            dn = jax.lax.ppermute(own, axis, perm_up())
            if D == 2:
                return tuple(jnp.concatenate([own, dn], axis=1))
            up = jax.lax.ppermute(own, axis, perm_dn())
            return tuple(jnp.concatenate([own, dn, up], axis=1))

        f3 = jnp.stack([fx, fy, fz])
        sfT = jnp.transpose(sforce)  # [3, S]
        v3, sv3 = matvec(f3, sfT)

        if noisy:
            z0g = noise_g * mask[None]
            z0s = noise_s * sm[None]

            def mv_flat(v):
                gg = v[: 3 * slots_loc].reshape((3,) + x.shape)
                gs = v[3 * slots_loc:].reshape(3, S)
                ov, osv = matvec(gg, gs)
                return jnp.concatenate(
                    [ov.reshape(-1), osv.reshape(-1)]
                )

            v0 = jnp.concatenate([z0g.reshape(-1), z0s.reshape(-1)])
            b = lanczos_sqrt_apply_dd(
                mv_flat, v0, be.lanczos_iterations, axis
            )
            bg = b[: 3 * slots_loc].reshape((3,) + x.shape)
            bs = b[3 * slots_loc:].reshape(3, S)
            a_ = np.float32(amp)
            v3 = v3 + a_ * bg
            sv3 = sv3 + a_ * bs * sm[None]

        # ---- far-bound bucketing (shard-local two-sort + tags)
        Lv0 = np.float32(Ls[0])
        lx = jnp.concatenate([x.reshape(-1), spos[:, 0]])
        ly = jnp.concatenate([y.reshape(-1), spos[:, 1]])
        lz = jnp.concatenate([z.reshape(-1), spos[:, 2]])
        lfx = jnp.concatenate([fx.reshape(-1), sforce[:, 0]])
        lfy = jnp.concatenate([fy.reshape(-1), sforce[:, 1]])
        lfz = jnp.concatenate([fz.reshape(-1), sforce[:, 2]])
        lval = jnp.concatenate([mask.reshape(-1) > 0.5, sm])
        xw = lx - Lv0 * jnp.round(lx / Lv0)
        owner = jnp.clip(
            (jnp.mod(xw / Lv0 + 0.5, 1.0) * D).astype(jnp.int32), 0, D - 1
        )
        key2 = jnp.concatenate([
            jnp.where(lval, owner, D) * 2,
            jnp.repeat(jnp.arange(D, dtype=jnp.int32), far_m2) * 2 + 1,
        ])
        T2 = D * far_m2

        def pad(c, fill):
            return jnp.concatenate([c, jnp.full((T2,), fill, c.dtype)])

        yw = jnp.where(lval, ly - np.float32(Ls[1]) * jnp.round(
            ly / np.float32(Ls[1])), 0.0)
        zw = jnp.where(lval, lz - np.float32(Ls[2]) * jnp.round(
            lz / np.float32(Ls[2])), 0.0)
        tags = jnp.arange(m_loc, dtype=jnp.int32)
        cols = (
            pad(jnp.where(lval, xw, 0.0), 0.0), pad(yw, 0.0), pad(zw, 0.0),
            pad(lfx, 0.0), pad(lfy, 0.0), pad(lfz, 0.0),
            pad(lval.astype(jnp.float32), 0.0),
            pad(jnp.where(lval, tags, m_loc), m_loc),
        )
        srt = jax.lax.sort((key2,) + cols, dimension=0, num_keys=1)
        cell = srt[0] >> 1
        idx = jnp.arange(m_loc + T2, dtype=jnp.int32)
        first = jnp.searchsorted(cell, cell, side="left").astype(jnp.int32)
        rank = idx - first
        kept = rank < far_m2
        is_real = (srt[0] & 1) == 0
        ovf = ovf + jnp.any(
            is_real & ~kept & (cell < D)
        ).astype(jnp.float32)
        slot = jnp.where(kept & (cell < D), cell * far_m2 + rank, T2 + idx)
        s2 = jax.lax.sort((slot,) + srt[1:], dimension=0, num_keys=1)
        buckets = jnp.stack(
            [c[:T2] for c in s2[1:8]], axis=-1
        ).reshape(D, far_m2, 7)
        tag_out = s2[8][:T2].reshape(D, far_m2)
        # ship to the x-shards (ONE all_to_all of [D, m2, 6])
        far_in = jax.lax.all_to_all(
            buckets, axis, split_axis=0, concat_axis=0, tiled=True
        )
        return (x, y, z, pidf, rx, ry, rz, spos, spidf, sref, ovf, nreb,
                v3, jnp.transpose(sv3), f3, sforce, far_in, tag_out)

    def from_far_and_update(x, y, z, pidf, spos, spidf, v3, sv3,
                            vel_back, tags):
        """Reverse all_to_all of the far velocities + EM position update
        in slot space."""
        vb = jax.lax.all_to_all(
            vel_back, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [D, m2, 3]: row j = far velocities of MY bucket sent to j
        flat_v = (
            jnp.zeros((m_loc + 1, 3), jnp.float32)
            .at[tags.reshape(-1)].add(vb.reshape(-1, 3))[:m_loc]
        )
        slot_far = flat_v[:slots_loc].reshape(x.shape + (3,))
        strag_far = flat_v[slots_loc:]
        mask = (pidf > 0.5).astype(x.dtype)
        dt_ = np.float32(dt)
        x = x + dt_ * mask * (v3[0] + slot_far[..., 0])
        y = y + dt_ * mask * (v3[1] + slot_far[..., 1])
        z = z + dt_ * mask * (v3[2] + slot_far[..., 2])
        sm = (spidf > 0.5)[:, None]
        spos = spos + dt_ * jnp.where(sm, sv3 + strag_far, 0.0)
        return x, y, z, spos

    gspec = P(axis)
    nspec = P(None, axis)
    phase1 = jax.shard_map(
        near_and_to_far, mesh=mesh,
        in_specs=(gspec,) * 12 + (nspec, nspec),
        out_specs=(gspec,) * 12 + (nspec, gspec, nspec, gspec, gspec,
                                   gspec),
        check_vma=False,
    )
    phase2 = jax.shard_map(
        from_far_and_update, mesh=mesh,
        in_specs=(gspec,) * 6 + (nspec, gspec, gspec, gspec),
        out_specs=(gspec,) * 4,
        check_vma=False,
    )
    shard = NamedSharding(mesh, gspec)

    @jax.jit
    def step(state, key):
        (x, y, z, pidf, rx, ry, rz, spos, spidf, sref, ovf, nreb) = state
        k_far, k_g, k_s = jax.random.split(key, 3)
        if noisy:
            noise_g = jax.lax.with_sharding_constraint(
                jax.random.normal(k_g, (3, nz, nyb, cap, nlane),
                                  jnp.float32),
                NamedSharding(mesh, P(None, axis)),
            )
            noise_s = jax.lax.with_sharding_constraint(
                jax.random.normal(k_s, (3, D * S), jnp.float32),
                NamedSharding(mesh, P(None, axis)),
            )
        else:
            noise_g = jnp.zeros((3, nz, nyb, cap, nlane), jnp.float32)
            noise_s = jnp.zeros((3, D * S), jnp.float32)
        out = phase1(x, y, z, pidf, rx, ry, rz, spos, spidf, sref,
                     ovf, nreb, noise_g, noise_s)
        (x, y, z, pidf, rx, ry, rz, spos, spidf, sref, ovf, nreb,
         v3, sv3, f3, sforce, far_in, tags) = out
        # far field on the x-shards (global view: [D, D*m2, ...])
        pos_far = far_in.reshape(D, D * far_m2, 7)
        maskf = pos_far[:, :, 6] > 0.5
        if noisy:
            vel_far = far_mf(pos_far[:, :, 0:3], pos_far[:, :, 3:6],
                             maskf, k_far, jnp.float32(amp))
        else:
            vel_far = far_mf(pos_far[:, :, 0:3], pos_far[:, :, 3:6],
                             maskf)
        vel_back = vel_far.reshape(D * D, far_m2, 3)
        x, y, z, spos = phase2(
            x, y, z, pidf, spos, spidf, v3, sv3, vel_back, tags,
        )
        return (x, y, z, pidf, rx, ry, rz, spos, spidf, sref, ovf, nreb)

    def make_state(pos):
        cg = pack_channels(spec, jnp.asarray(pos, jnp.float32),
                           jnp.zeros((n, 0), jnp.float32))
        pidf = (cg.pid + 1).astype(jnp.float32)
        spidf_g = (cg.spid + 1).astype(jnp.float32)
        # distribute the global straggler list to slab owners (host side)
        spos_np = np.asarray(jax.device_get(cg.spos))
        spidf_np = np.asarray(jax.device_get(spidf_g))
        spos_s = np.full((D, S, 3), EMPTY_POS, np.float32)
        spidf_s = np.zeros((D, S), np.float32)
        fill = [0] * D
        for r in range(S):
            if spidf_np[r] <= 0.5:
                continue
            frac = (spos_np[r, 2] / Ls[2] + 0.5) % 1.0
            cz = min(int(frac * nz), nz - 1)
            sh = cz // nz_loc
            k = fill[sh]
            if k >= S:
                raise ValueError("per-shard straggler budget exceeded")
            spos_s[sh, k] = spos_np[r]
            spidf_s[sh, k] = spidf_np[r]
            fill[sh] = k + 1
        put = lambda a: jax.device_put(a, shard)
        spos0 = put(jnp.asarray(spos_s.reshape(D * S, 3)))
        spidf0 = put(jnp.asarray(spidf_s.reshape(D * S)))
        return (
            put(cg.x), put(cg.y), put(cg.z), put(pidf),
            put(cg.x), put(cg.y), put(cg.z),
            spos0, spidf0, spos0,
            put(jnp.zeros((D,), jnp.float32)
                + cg.overflow.astype(jnp.float32)),
            put(jnp.zeros((D,), jnp.int32)),
        )

    return step, make_state


def gather_positions(state, spec, n: int):
    """Sharded PSE state -> [N, 3] positions in pid order (host side)."""
    x, y, z, pidf = (np.asarray(a) for a in state[0:4])
    spos = np.asarray(state[7])
    spidf = np.asarray(state[8])
    pid = np.rint(pidf).astype(np.int64).reshape(-1) - 1
    cols = np.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    spid = np.rint(spidf).astype(np.int64) - 1
    allpid = np.concatenate([pid, spid])
    allc = np.concatenate([cols, spos], axis=0)
    keep = allpid >= 0
    out = np.zeros((n, 3), np.float32)
    out[allpid[keep]] = allc[keep]
    return out
