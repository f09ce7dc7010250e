"""Multi-chip spectral FCM: x-slab-sharded grid, distributed FFT.

The reference's spectral solvers are single-GPU cuFFT pipelines (reference:
src/Integrator/BDHI/FCM/FCM_impl.cuh:654-693); the multi-chip capability is
the TPU build's own obligation (SURVEY 2.6/§5 "sharded FFTs via all-to-all
over ICI"). Design:

- **particles**: each shard owns the particles whose x falls in its slab
  (padded [D, m, 3] shards with a validity mask — shard_particles_x);
- **spread**: local scatter onto an x-extended slab [nx_loc + 2P, ny, nz]
  (P = kernel support), then one ppermute pair ADDS the pad planes into the
  neighbours' interiors (halo reduce) — contributions that cross a slab
  boundary are never lost;
- **distributed FFT**: rfft(z) + fft(y) locally, one all-to-all transpose
  (kz-split -> x-gathered), fft(x) locally, wave-space scaling on the local
  kz chunk, and the mirrored inverse path. kz is padded to a multiple of the
  mesh size; pad planes are zeroed both ways;
- **interpolate**: halo-extend the velocity slab (ppermute copy) and gather
  at the local particles.

One chip's memory holds 1/D of the grid end to end, and every collective is
a neighbour ppermute or a single all-to-all — the patterns ICI is built for.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.box import Box
from ..solvers.ibm import GaussianKernel, _weights_and_indices


def shard_particles_x(pos, values, n_dev, box: Box):
    """Assign particles to x-slabs: returns (pos_sh [D, m, 3],
    val_sh [D, m, C], mask [D, m], order [D, m] original indices; m padded
    to the fullest shard). Host-side prep (not jitted)."""
    pos = np.asarray(pos)
    values = np.asarray(values)
    L = float(np.asarray(jax.device_get(box.size))[0])
    x = np.mod(pos[:, 0] / L + 0.5, 1.0)
    owner = np.clip((x * n_dev).astype(int), 0, n_dev - 1)
    m = max(np.bincount(owner, minlength=n_dev).max(), 1)
    D = n_dev
    pos_sh = np.zeros((D, m, 3), pos.dtype)
    val_sh = np.zeros((D, m) + values.shape[1:], values.dtype)
    mask = np.zeros((D, m), bool)
    order = np.zeros((D, m), np.int64)
    for d in range(D):
        idx = np.nonzero(owner == d)[0]
        pos_sh[d, : len(idx)] = pos[idx]
        val_sh[d, : len(idx)] = values[idx]
        mask[d, : len(idx)] = True
        order[d, : len(idx)] = idx
    return (
        jnp.asarray(pos_sh), jnp.asarray(val_sh),
        jnp.asarray(mask), jnp.asarray(order),
    )


def gather_shards(out_sh, mask, order, n):
    """Inverse of shard_particles_x for per-particle outputs."""
    out = np.zeros((n,) + out_sh.shape[2:], np.asarray(out_sh).dtype)
    o = np.asarray(out_sh)
    m = np.asarray(mask)
    idx = np.asarray(order)
    out[idx[m]] = o[m]
    return jnp.asarray(out)


def make_sharded_fcm_mf(
    mesh: Mesh,
    box: Box,
    *,
    viscosity: float = 1.0,
    radius: float = 1.0,
    shape: tuple,
    support: int = 6,
    axis: str = "x",
    rpy_sinc_radius: float | None = None,
    hasimoto_k2: float | None = None,
    noise: bool = False,
):
    """Build mf(pos_sh, force_sh, mask[, key, noise_amp]) -> vel_sh: the
    FCM M F product with the grid x-sharded over the mesh. shape[0] must
    divide the mesh size.

    ``rpy_sinc_radius`` / ``hasimoto_k2`` enable the PSE far-field envelope
    (FCM._envelope2 — sinc^2(k a) (1 + sigma^2 k^2)), making this the
    multi-chip PSE far field (reference: src/Integrator/BDHI/PSE/
    FarField.cuh; sharding is the TPU build's own obligation, SURVEY 2.6).
    ``noise=True`` fuses the k-space fluctuation: per-shard white noise
    rides the same distributed FFT as the spread forces (channel concat),
    is filtered by sqrt of the mobility kernel, and is added before the
    inverse transform — the compute_mf_bdw fusion, sharded."""
    D = mesh.devices.size
    nx, ny, nz = shape
    assert nx % D == 0, "shape[0] must divide the mesh"
    nx_loc = nx // D
    Ls = [float(s) for s in np.asarray(jax.device_get(box.size))]
    sigma = radius / math.sqrt(math.pi)
    h = Ls[0] / nx
    kern = GaussianKernel(sigma=sigma / h, support=support)
    Pad = support
    assert Pad <= nx_loc, "slab thinner than the kernel support"
    nzr = nz // 2 + 1
    nzr_pad = ((nzr + D - 1) // D) * D
    kz_chunk = nzr_pad // D

    kxf = 2.0 * math.pi * np.fft.fftfreq(nx, d=Ls[0] / nx)
    kyf = 2.0 * math.pi * np.fft.fftfreq(ny, d=Ls[1] / ny)
    kzf = np.zeros(nzr_pad)
    kzf[:nzr] = 2.0 * math.pi * np.fft.rfftfreq(nz, d=Ls[2] / nz)
    kz_valid = np.zeros(nzr_pad, bool)
    kz_valid[:nzr] = True

    dV = float(np.prod([L / s for L, s in zip(Ls, shape)]))

    def mf_shard(pos, force, mask, key=None, noise_amp=None):
        dtype = pos.dtype
        idxv = jax.lax.axis_index(axis)
        x0 = idxv * nx_loc

        # ---- local spread onto the extended slab
        idx, w, hv = _weights_and_indices(kern, pos, box, shape)
        inv_dV = 1.0 / jnp.prod(hv)
        lx = jnp.mod(idx[..., 0] - x0 + Pad, nx)
        inside = (lx < nx_loc + 2 * Pad) & mask[:, None]
        lx = jnp.where(inside, lx, 0)
        contrib = jnp.where(
            inside[:, :, None], (w * inv_dV)[:, :, None] * force[:, None, :],
            0.0,
        )
        ext = jnp.zeros((nx_loc + 2 * Pad, ny, nz, 3), dtype)
        ext = ext.at[lx, idx[..., 1], idx[..., 2]].add(contrib)

        # ---- halo reduce: pads add into the neighbours' interiors
        left = jax.lax.ppermute(
            ext[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        right = jax.lax.ppermute(
            ext[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        f = ext[Pad:-Pad]
        f = f.at[-Pad:].add(left)
        f = f.at[:Pad].add(right)

        if noise:
            # per-shard white noise rides the same distributed FFT
            wn = jax.random.normal(
                jax.random.fold_in(key, idxv), (nx_loc, ny, nz, 3), dtype
            ) / math.sqrt(dV)
            f = jnp.concatenate([f, wn], axis=-1)

        # ---- forward distributed FFT: [nx_loc, ny, nz, C]
        fk = jnp.fft.rfft(f, axis=2)
        fk = jnp.fft.fft(fk, axis=1)
        fk = jnp.pad(fk, ((0, 0), (0, 0), (0, nzr_pad - nzr), (0, 0)))
        # kz-split, x-gather
        fk = jax.lax.all_to_all(
            fk, axis, split_axis=2, concat_axis=0, tiled=True
        )  # [nx, ny, kz_chunk, C]
        fk = jnp.fft.fft(fk, axis=0)

        # ---- wave-space Stokes projector on the local kz chunk
        kx = jnp.asarray(kxf, dtype)[:, None, None]
        ky = jnp.asarray(kyf, dtype)[None, :, None]
        kz = jax.lax.dynamic_slice(
            jnp.asarray(kzf, dtype), (idxv * kz_chunk,), (kz_chunk,)
        )[None, None, :]
        valid = jax.lax.dynamic_slice(
            jnp.asarray(kz_valid), (idxv * kz_chunk,), (kz_chunk,)
        )[None, None, :]
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotf = kx * fk[..., 0] + ky * fk[..., 1] + kz * fk[..., 2]
        pref = valid & (k2 > 0)
        env2 = None
        if rpy_sinc_radius is not None or hasimoto_k2 is not None:
            env2 = 1.0
            if rpy_sinc_radius is not None:
                xk = jnp.sqrt(k2) * rpy_sinc_radius
                xs = jnp.where(xk > 1e-8, xk, 1.0)
                sc = jnp.where(xk > 1e-8, jnp.sin(xs) / xs,
                               1.0 - xk * xk / 6.0)
                env2 = env2 * (sc * sc)
            if hasimoto_k2 is not None:
                env2 = env2 * (1.0 + hasimoto_k2 * k2)
        scale = jnp.where(pref, 1.0 / (viscosity * k2s), 0.0)
        if env2 is not None:
            scale = scale * env2
        uk = jnp.stack(
            [
                scale * (fk[..., 0] - kx * kdotf / k2s),
                scale * (fk[..., 1] - ky * kdotf / k2s),
                scale * (fk[..., 2] - kz * kdotf / k2s),
            ],
            axis=-1,
        )
        if noise:
            nk = fk[..., 3:6]
            kdotn = kx * nk[..., 0] + ky * nk[..., 1] + kz * nk[..., 2]
            nscale = jnp.where(
                pref, noise_amp / jnp.sqrt(viscosity * k2s), 0.0
            )
            if env2 is not None:
                nscale = nscale * jnp.sqrt(env2)
            uk = uk + jnp.stack(
                [
                    nscale * (nk[..., 0] - kx * kdotn / k2s),
                    nscale * (nk[..., 1] - ky * kdotn / k2s),
                    nscale * (nk[..., 2] - kz * kdotn / k2s),
                ],
                axis=-1,
            )

        # ---- inverse distributed FFT
        uk = jnp.fft.ifft(uk, axis=0)
        uk = jax.lax.all_to_all(
            uk, axis, split_axis=0, concat_axis=2, tiled=True
        )  # [nx_loc, ny, nzr_pad, 3]
        uk = uk[:, :, :nzr]
        u = jnp.fft.ifft(uk, axis=1)
        u = jnp.fft.irfft(u, n=nz, axis=2)

        # ---- halo extend + local interpolation
        lo = jax.lax.ppermute(
            u[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        hi = jax.lax.ppermute(
            u[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        ue = jnp.concatenate([hi, u, lo], axis=0)
        vals = ue[lx, idx[..., 1], idx[..., 2]]  # [m, s^3, 3]
        vel = jnp.sum(
            jnp.where(inside[:, :, None], w[:, :, None] * vals, 0.0), axis=1
        )
        return vel * mask[:, None]

    spec_p = P(axis)
    if noise:
        mf = jax.shard_map(
            mf_shard,
            mesh=mesh,
            in_specs=(spec_p, spec_p, spec_p, P(), P()),
            out_specs=spec_p,
            check_vma=False,
        )

        def apply(pos_sh, force_sh, mask, key, noise_amp):
            D_, m = pos_sh.shape[:2]
            out = mf(
                pos_sh.reshape(D_ * m, 3),
                force_sh.reshape(D_ * m, 3),
                mask.reshape(D_ * m),
                key, jnp.asarray(noise_amp, pos_sh.dtype),
            )
            return out.reshape(D_, m, 3)
    else:
        mf = jax.shard_map(
            lambda p, f, m: mf_shard(p, f, m),
            mesh=mesh,
            in_specs=(spec_p, spec_p, spec_p),
            out_specs=spec_p,
            check_vma=False,
        )

        def apply(pos_sh, force_sh, mask):
            D_, m = pos_sh.shape[:2]
            out = mf(
                pos_sh.reshape(D_ * m, 3),
                force_sh.reshape(D_ * m, 3),
                mask.reshape(D_ * m),
            )
            return out.reshape(D_, m, 3)

    return jax.jit(apply)


def make_sharded_poisson(
    mesh: Mesh,
    box: Box,
    *,
    epsilon: float = 1.0,
    gw: float = 1.0,
    shape: tuple,
    support: int = 12,
    axis: str = "x",
):
    """Sharded triply periodic spectral Poisson (the multi-chip path of
    electrostatics.poisson.Poisson.fields; reference single-GPU pipeline:
    src/Interactor/SpectralEwaldPoisson.cuh): charge spread on x-slabs with
    halo reduce, distributed FFT, phi_k = rho_k/(eps k^2), E = -ik phi,
    mirrored inverse, local interpolation.

    Returns apply(pos_sh, q_sh, mask) -> (phi_sh [D, m], E_sh [D, m, 3]).
    """
    D = mesh.devices.size
    nx, ny, nz = shape
    assert nx % D == 0, "shape[0] must divide the mesh"
    nx_loc = nx // D
    Ls = [float(s) for s in np.asarray(jax.device_get(box.size))]
    h = Ls[0] / nx
    kern = GaussianKernel(sigma=gw / h, support=support)
    Pad = support
    assert Pad <= nx_loc, "slab thinner than the kernel support"
    nzr = nz // 2 + 1
    nzr_pad = ((nzr + D - 1) // D) * D
    kz_chunk = nzr_pad // D

    kxf = 2.0 * math.pi * np.fft.fftfreq(nx, d=Ls[0] / nx)
    kyf = 2.0 * math.pi * np.fft.fftfreq(ny, d=Ls[1] / ny)
    kzf = np.zeros(nzr_pad)
    kzf[:nzr] = 2.0 * math.pi * np.fft.rfftfreq(nz, d=Ls[2] / nz)
    kz_valid = np.zeros(nzr_pad, bool)
    kz_valid[:nzr] = True

    def shard_fn(pos, q, mask):
        dtype = pos.dtype
        idxv = jax.lax.axis_index(axis)
        x0 = idxv * nx_loc

        idx, w, hv = _weights_and_indices(kern, pos, box, shape)
        inv_dV = 1.0 / jnp.prod(hv)
        lx = jnp.mod(idx[..., 0] - x0 + Pad, nx)
        inside = (lx < nx_loc + 2 * Pad) & mask[:, None]
        lx = jnp.where(inside, lx, 0)
        contrib = jnp.where(inside, (w * inv_dV) * q[:, None], 0.0)
        ext = jnp.zeros((nx_loc + 2 * Pad, ny, nz), dtype)
        ext = ext.at[lx, idx[..., 1], idx[..., 2]].add(contrib)

        left = jax.lax.ppermute(
            ext[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        right = jax.lax.ppermute(
            ext[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        rho = ext[Pad:-Pad]
        rho = rho.at[-Pad:].add(left)
        rho = rho.at[:Pad].add(right)

        rk = jnp.fft.rfft(rho, axis=2)
        rk = jnp.fft.fft(rk, axis=1)
        rk = jnp.pad(rk, ((0, 0), (0, 0), (0, nzr_pad - nzr)))
        rk = jax.lax.all_to_all(
            rk, axis, split_axis=2, concat_axis=0, tiled=True
        )
        rk = jnp.fft.fft(rk, axis=0)

        kx = jnp.asarray(kxf, dtype)[:, None, None]
        ky = jnp.asarray(kyf, dtype)[None, :, None]
        kz = jax.lax.dynamic_slice(
            jnp.asarray(kzf, dtype), (idxv * kz_chunk,), (kz_chunk,)
        )[None, None, :]
        valid = jax.lax.dynamic_slice(
            jnp.asarray(kz_valid), (idxv * kz_chunk,), (kz_chunk,)
        )[None, None, :]
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        ok = valid & (k2 > 0)
        phi_k = jnp.where(ok, rk / (epsilon * k2s), 0.0)
        fields_k = jnp.stack(
            [phi_k, -1j * kx * phi_k, -1j * ky * phi_k, -1j * kz * phi_k],
            axis=-1,
        )

        fields_k = jnp.fft.ifft(fields_k, axis=0)
        fields_k = jax.lax.all_to_all(
            fields_k, axis, split_axis=0, concat_axis=2, tiled=True
        )
        fields_k = fields_k[:, :, :nzr]
        u = jnp.fft.ifft(fields_k, axis=1)
        u = jnp.fft.irfft(u, n=nz, axis=2)  # [nx_loc, ny, nz, 4]

        lo = jax.lax.ppermute(
            u[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        hi = jax.lax.ppermute(
            u[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        ue = jnp.concatenate([hi, u, lo], axis=0)
        vals = ue[lx, idx[..., 1], idx[..., 2]]  # [m, s^3, 4]
        out = jnp.sum(
            jnp.where(inside[:, :, None], w[:, :, None] * vals, 0.0), axis=1
        )
        out = out * mask[:, None]
        return out[:, 0], out[:, 1:4]

    spec_p = P(axis)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_p, spec_p, spec_p),
        out_specs=(spec_p, spec_p),
        check_vma=False,
    )

    def apply(pos_sh, q_sh, mask):
        D_, m = pos_sh.shape[:2]
        phi, E = fn(
            pos_sh.reshape(D_ * m, 3),
            q_sh.reshape(D_ * m),
            mask.reshape(D_ * m),
        )
        return phi.reshape(D_, m), E.reshape(D_, m, 3)

    return jax.jit(apply)


def make_sharded_dpstokes_mf(mesh: Mesh, dps, axis: str = "x"):
    """Sharded doubly periodic Stokes M F: x-slab particles/grid, ky-sharded
    per-mode BVP solves (reference: src/Integrator/BDHI/DoublyPeriodic/
    DPStokesSlab.cuh — single-GPU; sharding is the TPU build's own
    obligation, SURVEY 2.6/§5).

    Structure (1-D mesh over ``axis``):
    - local spread on an x-extended slab + ppermute halo reduce (the FCM
      pattern above), z = full Chebyshev axis on every shard;
    - rfft(y) locally, ONE all-to-all (ky-split, x-gather), fft(x) locally;
    - the batched 4nz x 4nz BVP inverses are applied on each shard's ky
      chunk — the precomputed operator tensor itself is sharded over ky, so
      each chip stores 1/D of the (large) dense inverses;
    - mirrored inverse transforms, halo extend, local interpolation.

    Returns jitted apply(pos_sh, force_sh, mask) -> vel_sh for shards from
    shard_particles_x.
    """
    D = mesh.devices.size
    nx, ny = dps.shape
    nz = dps.nz
    assert nx % D == 0, "shape[0] must divide the mesh"
    nx_loc = nx // D
    Pad = dps.support
    assert Pad <= nx_loc, "slab thinner than the kernel support"
    nyk = ny // 2 + 1
    nyk_pad = ((nyk + D - 1) // D) * D
    nyc = nyk_pad // D
    s = dps.support
    hx = dps.box_size[0] / nx
    hy = dps.box_size[1] / ny

    # [nyk_pad, nx, 4nz, 4nz]: ky leading so P(axis) shards the mode axis
    ops = np.asarray(dps.inv_ops).reshape(nx, nyk, 4 * nz, 4 * nz)
    ops = np.transpose(ops, (1, 0, 2, 3))
    ops = np.pad(ops, ((0, nyk_pad - nyk), (0, 0), (0, 0), (0, 0)))
    ops_j = jnp.asarray(ops)

    def mf_shard(pos, force, mask, ops_loc):
        dtype = pos.dtype
        idxv = jax.lax.axis_index(axis)
        x0 = idxv * nx_loc

        gx, gy, wx, wy, norm = dps._xy_weights(pos, dtype)
        phi_z, w_cc = dps._z_weights(pos, dtype)
        lx = jnp.mod(gx - x0 + Pad, nx)                 # [m, s]
        insx = lx < nx_loc + 2 * Pad
        lxb = jnp.where(insx, lx, 0)
        inside = insx[:, :, None] & mask[:, None, None]  # [m, s, s]
        w_base = norm * wx[:, :, None] * wy[:, None, :]
        w_base = jnp.where(inside, w_base, 0.0)

        # ---- local spread + halo reduce
        contrib = (
            (w_base / (hx * hy))[..., None, None]
            * phi_z[:, None, None, :, None]
            * force[:, None, None, None, :]
        )
        m_ = pos.shape[0]
        ix = jnp.broadcast_to(lxb[:, :, None], (m_, s, s)).reshape(-1)
        iy = jnp.broadcast_to(gy[:, None, :], (m_, s, s)).reshape(-1)
        ext = jnp.zeros((nx_loc + 2 * Pad, ny, nz, 3), dtype)
        ext = ext.at[ix, iy].add(contrib.reshape(-1, nz, 3))
        left = jax.lax.ppermute(
            ext[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        right = jax.lax.ppermute(
            ext[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        f = ext[Pad:-Pad]
        f = f.at[-Pad:].add(left)
        f = f.at[:Pad].add(right)

        # ---- distributed xy FFT (ky-split, x-gather)
        fk = jnp.fft.rfft(f, axis=1)                    # [nx_loc, nyk, ..]
        fk = jnp.pad(fk, ((0, 0), (0, nyk_pad - nyk), (0, 0), (0, 0)))
        fk = jax.lax.all_to_all(
            fk, axis, split_axis=1, concat_axis=0, tiled=True
        )                                               # [nx, nyc, nz, 3]
        fk = jnp.fft.fft(fk, axis=0)

        # ---- per-mode BVP on the local ky chunk
        rhs = jnp.concatenate(
            [-fk[..., 0], -fk[..., 1], -fk[..., 2],
             jnp.zeros_like(fk[..., 0])],
            axis=-1,
        )                                               # [nx, nyc, 4nz]
        for bb in range(3):
            rhs = (
                rhs.at[..., bb * nz].set(0.0)
                .at[..., bb * nz + nz - 1].set(0.0)
            )
        ops_flat = ops_loc.transpose(1, 0, 2, 3).reshape(
            nx * nyc, 4 * nz, 4 * nz
        )
        sol = jnp.einsum(
            "kij,kj->ki", ops_flat, rhs.reshape(nx * nyc, 4 * nz)
        ).reshape(nx, nyc, 4 * nz)
        uk = jnp.stack(
            [sol[..., 0:nz], sol[..., nz:2 * nz], sol[..., 2 * nz:3 * nz]],
            axis=-1,
        )

        # ---- inverse transforms + halo extend + interpolation
        uk = jnp.fft.ifft(uk, axis=0)
        uk = jax.lax.all_to_all(
            uk, axis, split_axis=0, concat_axis=1, tiled=True
        )                                               # [nx_loc, nyk_pad,..]
        u = jnp.fft.irfft(uk[:, :nyk], n=ny, axis=1)
        lo = jax.lax.ppermute(
            u[:Pad], axis, [(i, (i - 1) % D) for i in range(D)]
        )
        hi = jax.lax.ppermute(
            u[-Pad:], axis, [(i, (i + 1) % D) for i in range(D)]
        )
        ue = jnp.concatenate([hi, u, lo], axis=0)
        vals = ue[
            jnp.broadcast_to(lxb[:, :, None], (m_, s, s)),
            jnp.broadcast_to(gy[:, None, :], (m_, s, s)),
        ]                                               # [m, s, s, nz, 3]
        zquad = phi_z * w_cc[None, :]
        vel = jnp.einsum("nab,nz,nabzc->nc", w_base, zquad, vals)
        return vel * mask[:, None]

    spec_p = P(axis)
    mf = jax.shard_map(
        mf_shard,
        mesh=mesh,
        in_specs=(spec_p, spec_p, spec_p, spec_p),
        out_specs=spec_p,
        check_vma=False,
    )

    def apply(pos_sh, force_sh, mask):
        D_, m = pos_sh.shape[:2]
        out = mf(
            pos_sh.reshape(D_ * m, 3),
            force_sh.reshape(D_ * m, 3),
            mask.reshape(D_ * m),
            ops_j,
        )
        return out.reshape(D_, m, 3)

    return jax.jit(apply)


def make_mesh_2d(dx: int, dy: int, axes=("x", "y")) -> Mesh:
    devs = jax.devices()
    if dx * dy > len(devs):
        raise ValueError(
            f"requested {dx}x{dy} mesh but only {len(devs)} devices are "
            f"visible (set XLA_FLAGS=--xla_force_host_platform_device_count)"
        )
    return Mesh(np.asarray(devs[: dx * dy]).reshape(dx, dy), axes)


def shard_particles_xy(pos, values, dx, dy, box: Box):
    """Assign particles to (x, y) blocks of a 2-D mesh: returns
    (pos_sh [Dx*Dy, m, 3], val_sh, mask, order), block index = ix*dy + iy
    (mesh-major). Host-side prep."""
    pos = np.asarray(pos)
    values = np.asarray(values)
    Ls = np.asarray(jax.device_get(box.size))
    fx = np.mod(pos[:, 0] / float(Ls[0]) + 0.5, 1.0)
    fy = np.mod(pos[:, 1] / float(Ls[1]) + 0.5, 1.0)
    owner = (
        np.clip((fx * dx).astype(int), 0, dx - 1) * dy
        + np.clip((fy * dy).astype(int), 0, dy - 1)
    )
    D = dx * dy
    m = max(np.bincount(owner, minlength=D).max(), 1)
    pos_sh = np.zeros((D, m, 3), pos.dtype)
    val_sh = np.zeros((D, m) + values.shape[1:], values.dtype)
    mask = np.zeros((D, m), bool)
    order = np.zeros((D, m), np.int64)
    for d in range(D):
        idx = np.nonzero(owner == d)[0]
        pos_sh[d, : len(idx)] = pos[idx]
        val_sh[d, : len(idx)] = values[idx]
        mask[d, : len(idx)] = True
        order[d, : len(idx)] = idx
    return (
        jnp.asarray(pos_sh), jnp.asarray(val_sh),
        jnp.asarray(mask), jnp.asarray(order),
    )


def make_sharded_fcm_mf_2d(
    mesh: Mesh,
    box: Box,
    *,
    viscosity: float = 1.0,
    radius: float = 1.0,
    shape: tuple,
    support: int = 6,
    axes=("x", "y"),
):
    """FCM M F on a 2-D mesh: (x, y) pencil-block grid decomposition with
    sequential two-axis halo reduces and a two-stage distributed FFT (one
    all-to-all per mesh axis) — the 2-D ICI torus layout (SURVEY 2.6; the
    reference is single-GPU, this capability is the TPU build's own).

    kz is padded to a multiple of Dx*Dy; after the y-axis then x-axis
    all-to-alls each device holds the full (kx, ky) plane for its kz chunk.
    Returns jitted apply(pos_sh, force_sh, mask) over shard_particles_xy
    shards.
    """
    ax_x, ax_y = axes
    Dx, Dy = (mesh.shape[ax_x], mesh.shape[ax_y])
    nx, ny, nz = shape
    assert nx % Dx == 0 and ny % Dy == 0
    nx_loc, ny_loc = nx // Dx, ny // Dy
    Ls = [float(s) for s in np.asarray(jax.device_get(box.size))]
    sigma = radius / math.sqrt(math.pi)
    h = Ls[0] / nx
    kern = GaussianKernel(sigma=sigma / h, support=support)
    Pad = support
    assert Pad <= nx_loc and Pad <= ny_loc, "block thinner than the support"
    nzr = nz // 2 + 1
    D = Dx * Dy
    nzr_pad = ((nzr + D - 1) // D) * D
    kzy = nzr_pad // Dy          # chunk after the y all-to-all
    kz_chunk = nzr_pad // D      # chunk after both

    kxf = 2.0 * math.pi * np.fft.fftfreq(nx, d=Ls[0] / nx)
    kyf = 2.0 * math.pi * np.fft.fftfreq(ny, d=Ls[1] / ny)
    kzf = np.zeros(nzr_pad)
    kzf[:nzr] = 2.0 * math.pi * np.fft.rfftfreq(nz, d=Ls[2] / nz)
    kz_valid = np.zeros(nzr_pad, bool)
    kz_valid[:nzr] = True

    def mf_shard(pos, force, mask):
        dtype = pos.dtype
        ix = jax.lax.axis_index(ax_x)
        iy = jax.lax.axis_index(ax_y)
        x0 = ix * nx_loc
        y0 = iy * ny_loc

        # ---- local spread onto the (x, y)-extended block
        idx, w, hv = _weights_and_indices(kern, pos, box, shape)
        inv_dV = 1.0 / jnp.prod(hv)
        lx = jnp.mod(idx[..., 0] - x0 + Pad, nx)
        ly = jnp.mod(idx[..., 1] - y0 + Pad, ny)
        inside = (
            (lx < nx_loc + 2 * Pad) & (ly < ny_loc + 2 * Pad) & mask[:, None]
        )
        lx = jnp.where(inside, lx, 0)
        ly = jnp.where(inside, ly, 0)
        contrib = jnp.where(
            inside[:, :, None], (w * inv_dV)[:, :, None] * force[:, None, :],
            0.0,
        )
        ext = jnp.zeros((nx_loc + 2 * Pad, ny_loc + 2 * Pad, nz, 3), dtype)
        ext = ext.at[lx, ly, idx[..., 2]].add(contrib)

        # ---- halo reduce: x first (full extended-y rows so corners flow
        # x -> diagonal via the subsequent y fold), then y
        left = jax.lax.ppermute(
            ext[:Pad], ax_x, [(i, (i - 1) % Dx) for i in range(Dx)]
        )
        right = jax.lax.ppermute(
            ext[-Pad:], ax_x, [(i, (i + 1) % Dx) for i in range(Dx)]
        )
        ext = ext[Pad:-Pad]
        ext = ext.at[-Pad:].add(left)
        ext = ext.at[:Pad].add(right)
        down = jax.lax.ppermute(
            ext[:, :Pad], ax_y, [(i, (i - 1) % Dy) for i in range(Dy)]
        )
        up = jax.lax.ppermute(
            ext[:, -Pad:], ax_y, [(i, (i + 1) % Dy) for i in range(Dy)]
        )
        f = ext[:, Pad:-Pad]
        f = f.at[:, -Pad:].add(down)
        f = f.at[:, :Pad].add(up)

        # ---- distributed FFT: z local, gather y (split kz), gather x
        fk = jnp.fft.rfft(f, axis=2)                  # [nxl, nyl, nzr, 3]
        fk = jnp.pad(fk, ((0, 0), (0, 0), (0, nzr_pad - nzr), (0, 0)))
        fk = jax.lax.all_to_all(
            fk, ax_y, split_axis=2, concat_axis=1, tiled=True
        )                                             # [nxl, ny, kzy, 3]
        fk = jnp.fft.fft(fk, axis=1)
        fk = jax.lax.all_to_all(
            fk, ax_x, split_axis=2, concat_axis=0, tiled=True
        )                                             # [nx, ny, kz_chunk, 3]
        fk = jnp.fft.fft(fk, axis=0)

        # ---- wave-space projector on the local kz chunk
        kz0 = iy * kzy + ix * kz_chunk
        kx = jnp.asarray(kxf, dtype)[:, None, None]
        ky = jnp.asarray(kyf, dtype)[None, :, None]
        kz = jax.lax.dynamic_slice(
            jnp.asarray(kzf, dtype), (kz0,), (kz_chunk,)
        )[None, None, :]
        valid = jax.lax.dynamic_slice(
            jnp.asarray(kz_valid), (kz0,), (kz_chunk,)
        )[None, None, :]
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotf = kx * fk[..., 0] + ky * fk[..., 1] + kz * fk[..., 2]
        scale = jnp.where(valid & (k2 > 0), 1.0 / (viscosity * k2s), 0.0)
        uk = jnp.stack(
            [
                scale * (fk[..., 0] - kx * kdotf / k2s),
                scale * (fk[..., 1] - ky * kdotf / k2s),
                scale * (fk[..., 2] - kz * kdotf / k2s),
            ],
            axis=-1,
        )

        # ---- inverse path (mirror)
        uk = jnp.fft.ifft(uk, axis=0)
        uk = jax.lax.all_to_all(
            uk, ax_x, split_axis=0, concat_axis=2, tiled=True
        )                                             # [nxl, ny, kzy, 3]
        uk = jnp.fft.ifft(uk, axis=1)
        uk = jax.lax.all_to_all(
            uk, ax_y, split_axis=1, concat_axis=2, tiled=True
        )                                             # [nxl, nyl, nzr_pad, 3]
        u = jnp.fft.irfft(uk[:, :, :nzr], n=nz, axis=2)

        # ---- halo extend (y inside x so corners arrive) + interpolation
        dn = jax.lax.ppermute(
            u[:, :Pad], ax_y, [(i, (i - 1) % Dy) for i in range(Dy)]
        )
        up2 = jax.lax.ppermute(
            u[:, -Pad:], ax_y, [(i, (i + 1) % Dy) for i in range(Dy)]
        )
        u = jnp.concatenate([up2, u, dn], axis=1)
        lo = jax.lax.ppermute(
            u[:Pad], ax_x, [(i, (i - 1) % Dx) for i in range(Dx)]
        )
        hi = jax.lax.ppermute(
            u[-Pad:], ax_x, [(i, (i + 1) % Dx) for i in range(Dx)]
        )
        ue = jnp.concatenate([hi, u, lo], axis=0)
        vals = ue[lx, ly, idx[..., 2]]
        vel = jnp.sum(
            jnp.where(inside[:, :, None], w[:, :, None] * vals, 0.0), axis=1
        )
        return vel * mask[:, None]

    spec_p = P((ax_x, ax_y))
    mf = jax.shard_map(
        mf_shard,
        mesh=mesh,
        in_specs=(spec_p, spec_p, spec_p),
        out_specs=spec_p,
        check_vma=False,
    )

    def apply(pos_sh, force_sh, mask):
        D_, m = pos_sh.shape[:2]
        out = mf(
            pos_sh.reshape(D_ * m, 3),
            force_sh.reshape(D_ * m, 3),
            mask.reshape(D_ * m),
        )
        return out.reshape(D_, m, 3)

    return jax.jit(apply)
