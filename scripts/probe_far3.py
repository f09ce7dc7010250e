"""Fine-grained decomposition of the PSE far fused pass (round 4).

Times, at bench parameters (N=131k, far 144^3, support 8), each stage of
compute_mf_bdw in isolation:

- gathers:   pu = u[src], pv = values[src]  (bin-indexed gathers)
- weights:   wx/wy patch weights + dense-z weights (phi evaluations)
- outer:     wxy outer product + q = wz*values build
- einsum:    the per-pencil [P^2, cap, nz*C] contraction alone
- fold:      overlap-add folds + transpose to grid layout
- fftcombine: rfftn + project + noise sample + irfftn on the grid
- interp_win: window build (rolls/concats) for interpolation
- spread/interp/full: the composed passes for cross-checking

Run idle (1-core box). Env: PROBE_FAR_N, PROBE_FAR_ITERS, PROBE_FAR_GRID.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_FAR_N", 131072))
ITERS = int(os.environ.get("PROBE_FAR_ITERS", 10))
FAR = int(os.environ.get("PROBE_FAR_GRID", 144))


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, x0, label, iters=ITERS):
    run = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (fn(c), None), x0, None, length=iters)[0])
    x1 = run(x0)
    sync(x1)
    t0 = time.perf_counter()
    x1 = run(x1)
    sync(x1)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"component": label, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    from uammd_tpu.core.box import box
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers import pencil_ibm as pi
    from uammd_tpu.utils.lattices import lattice

    phi_frac, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi_frac) ** (1.0 / 3.0)
    b = box(L)
    pos = jnp.asarray(lattice(N, L, "fcc"), jnp.float32)
    be = PSEGrid.create(b, N, viscosity=1.0, radius=radius, far_grid=FAR,
                        tolerance=1e-4, lanczos_iterations=4, pos=pos,
                        n_strag=192)
    far = be.far
    kern = far._kernel(jnp.float32)
    shape = far.shape
    nz = shape[2]
    support = kern.support
    halo = pi._halo(support)
    P = pi.PENCIL + 2 * halo
    bins = far.pencil_bins(pos)
    cap = int(bins.pids.shape[1])
    npen = int(bins.pids.shape[0])
    npx, npy = shape[0] // pi.PENCIL, shape[1] // pi.PENCIL
    C = 3
    print(json.dumps({"far_grid": list(shape), "support": support,
                      "cap": cap, "npen": npen, "P": P}), flush=True)

    values = jax.random.normal(jax.random.key(1), (N, 3), jnp.float32)
    key = jax.random.key(2)

    # ---- components -----------------------------------------------------
    src = jnp.maximum(bins.pids - 1, 0)
    mask = bins.pids > 0

    def gathers(p):
        u = pi._node_coords(p, shape, b).astype(jnp.float32)
        pu = u[src]
        pv = jnp.where(mask[..., None], values[src], 0)
        return p + 1e-12 * (pu.sum() + pv.sum())

    timed(gathers, pos, "gathers")

    u0 = pi._node_coords(pos, shape, b).astype(jnp.float32)
    pu0 = u0[src]
    ox, oy = pi._pencil_origins(npx, npy, halo, jnp.float32)

    def weights(p):
        pu = pu0 + 1e-12 * p[0, 0]
        wx = pi._axis_weights(kern, pu[:, :, 0:1], ox[:, None, None], P,
                              shape[0])
        wy = pi._axis_weights(kern, pu[:, :, 1:2], oy[:, None, None], P,
                              shape[1])
        wz = pi._axis_weights(kern, pu[:, :, 2:3], 0.0, nz, shape[2])
        return p + 1e-12 * (wx.sum() + wy.sum() + wz.sum())

    timed(weights, pos, "weights_xyz")

    wx0 = pi._axis_weights(kern, pu0[:, :, 0:1], ox[:, None, None], P,
                           shape[0])
    wy0 = pi._axis_weights(kern, pu0[:, :, 1:2], oy[:, None, None], P,
                           shape[1])
    wz0 = pi._axis_weights(kern, pu0[:, :, 2:3], 0.0, nz, shape[2])
    pv0 = jnp.where(mask[..., None], values[src], 0)

    def outer(x):
        wx, wy, wz, pv = x
        wxy = (wx[:, :, :, None] * wy[:, :, None, :]).reshape(
            wx.shape[0], -1, P * P)
        q = (wz[:, :, :, None] * pv[:, :, None, :]).reshape(
            wz.shape[0], -1, nz * C)
        return (wx + 1e-12 * (wxy.sum() + q.sum()), wy, wz, pv)

    timed(outer, (wx0, wy0, wz0, pv0), "outer_products")

    # NOTE: wxy0/q0 cannot be carried through the timed scan — ~485 MB of
    # carry exceeds the remote-compile body limit on the tunnel. Build them
    # inside the jit from the ~125 MB weight set instead; the printed number
    # therefore INCLUDES the outer products (subtract "outer_products").

    # chunk size for the lax.map variants: a divisor of npen near 54
    # (npen = (FAR/PENCIL)^2 varies with PROBE_FAR_GRID)
    chunk_n = next(c for c in range(54, 0, -1) if npen % c == 0)

    def contract(x):
        wx, wy, wz, pv = x
        wxy = (wx[:, :, :, None] * wy[:, :, None, :]).reshape(npen, cap,
                                                              P * P)
        q = (wz[:, :, :, None] * pv[:, :, None, :]).reshape(npen, cap,
                                                            nz * C)
        patch = jnp.einsum("scp,scq->spq", wxy, q,
                           preferred_element_type=jnp.float32)
        return (wx + 1e-12 * patch.sum(), wy, wz, pv)

    timed(contract, (wx0, wy0, wz0, pv0), "outer_plus_einsum_whole")

    def contract_chunk(x):
        wx, wy, wz, pv = x

        def one(a):
            wxc, wyc, wzc, pvc = a
            wxy = (wxc[:, :, :, None] * wyc[:, :, None, :]).reshape(
                wxc.shape[0], cap, P * P)
            q = (wzc[:, :, :, None] * pvc[:, :, None, :]).reshape(
                wzc.shape[0], cap, nz * C)
            return jnp.einsum("scp,scq->spq", wxy, q,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(
            one,
            tuple(a.reshape(-1, chunk_n, *a.shape[1:])
                  for a in (wx, wy, wz, pv)),
        )
        return (wx + 1e-12 * out.sum(), wy, wz, pv)

    timed(contract_chunk, (wx0, wy0, wz0, pv0), "outer_plus_einsum_chunk54")

    def contract_chunk_bf16(x):
        wx, wy, wz, pv = x

        def one(a):
            wxc, wyc, wzc, pvc = a
            wxy = (wxc[:, :, :, None] * wyc[:, :, None, :]).reshape(
                wxc.shape[0], cap, P * P).astype(jnp.bfloat16)
            q = (wzc[:, :, :, None] * pvc[:, :, None, :]).reshape(
                wzc.shape[0], cap, nz * C).astype(jnp.bfloat16)
            return jnp.einsum("scp,scq->spq", wxy, q,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(
            one,
            tuple(a.reshape(-1, chunk_n, *a.shape[1:])
                  for a in (wx, wy, wz, pv)),
        )
        return (wx + 1e-12 * out.sum(), wy, wz, pv)

    timed(contract_chunk_bf16, (wx0, wy0, wz0, pv0),
          "outer_plus_einsum_chunk54_bf16")

    wxy0 = (wx0[:, :, :, None] * wy0[:, :, None, :]).reshape(npen, cap, P * P)
    q0 = (wz0[:, :, :, None] * pv0[:, :, None, :]).reshape(npen, cap, nz * C)
    patch0 = jnp.einsum("scp,scq->spq", wxy0, q0,
                        preferred_element_type=jnp.float32)
    del wxy0, q0

    def fold(pa):
        patch = pa.reshape(npx, npy, P, P, nz, C)
        patch = pi._fold(patch, halo, axis_p=0, axis_j=2)
        patch = pi._fold(patch, halo, axis_p=1, axis_j=3)
        field = patch.transpose(0, 2, 1, 3, 4, 5).reshape(
            npx * pi.PENCIL, npy * pi.PENCIL, nz, C)
        return pa + 1e-12 * field.sum()

    timed(fold, patch0, "fold_transpose")

    # ---- FFT + k-space combine on a fixed grid field ---------------------
    from uammd_tpu.integrators.bdhi.fcm import (_sample_white_rfft,
                                                _wavevectors)

    f_grid0 = jax.random.normal(jax.random.key(3), tuple(shape) + (3,),
                                jnp.float32)
    dV = float(np.prod(np.asarray(far.box_size)) / np.prod(shape))

    def fftcombine(f_grid):
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        kx, ky, kz = _wavevectors(shape, far.box_size, jnp.float32)
        uk = far._project(fk, kx, ky, kz)
        wk = _sample_white_rfft(key, shape, dV, jnp.float32)
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        kdotw = kx * wk[..., 0] + ky * wk[..., 1] + kz * wk[..., 2]
        scale = 1.0 / jnp.sqrt(far.viscosity * k2s)
        env2 = far._envelope2(kx, ky, kz)
        if env2 is not None:
            scale = scale * jnp.sqrt(env2)
        bk = jnp.stack([
            jnp.where(k2 == 0, 0, scale * (wk[..., c]
                                           - (kx, ky, kz)[c] * kdotw / k2s))
            for c in range(3)], axis=-1)
        u = jnp.fft.irfftn(uk + bk, s=shape, axes=(0, 1, 2))
        return f_grid + 1e-12 * u.sum()

    timed(fftcombine, f_grid0, "fft_project_noise_ifft")

    def fftonly(f_grid):
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1, 2))
        u = jnp.fft.irfftn(fk, s=shape, axes=(0, 1, 2))
        return f_grid + 1e-12 * u.sum()

    timed(fftonly, f_grid0, "fft_roundtrip_only")

    # ---- interpolation window build --------------------------------------
    def interp_win(f_grid):
        ft = f_grid.reshape(npx, pi.PENCIL, npy, pi.PENCIL, nz, C).transpose(
            0, 2, 1, 3, 4, 5)
        ftx = jnp.concatenate([
            jnp.roll(ft, 1, axis=0)[:, :, pi.PENCIL - halo:],
            ft,
            jnp.roll(ft, -1, axis=0)[:, :, :halo]], axis=2)
        win = jnp.concatenate([
            jnp.roll(ftx, 1, axis=1)[:, :, :, pi.PENCIL - halo:],
            ftx,
            jnp.roll(ftx, -1, axis=1)[:, :, :, :halo]], axis=3
        ).reshape(npen, P * P, nz * C)
        return f_grid + 1e-12 * win.sum()

    timed(interp_win, f_grid0, "interp_window_build")

    # ---- composed passes --------------------------------------------------
    def spread_body(p):
        f, _ = pi.spread_pencil(kern, p, values, shape, b, bins)
        return p + 1e-12 * f[0, 0, 0, 0]

    timed(spread_body, pos, "spread_pencil")

    def interp_body(p):
        v, _ = pi.interpolate_pencil(kern, p, f_grid0, b, bins)
        return p + 1e-12 * v[0, 0]

    timed(interp_body, pos, "interpolate_pencil")

    def far_body(p):
        v = far.compute_mf_bdw(p, values, key, 1.0, bins=bins)
        return p + 1e-12 * v[0, 0]

    timed(far_body, pos, "far_fused_persistentbins")

    for chunk in (32, 64, 108, 162, 324):
        def spread_c(p, chunk=chunk):
            f, _ = pi.spread_pencil(kern, p, values, shape, b, bins,
                                    chunk=chunk)
            return p + 1e-12 * f[0, 0, 0, 0]

        timed(spread_c, pos, f"spread_chunk{chunk}")


if __name__ == "__main__":
    main()
