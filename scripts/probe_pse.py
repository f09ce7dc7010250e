"""PSE component probe (round 3): where do the 549 ms/EM-step go, and
what do the candidate fixes buy? Run idle on the real TPU.

Components timed inside honest scans (carry feedback):
  pack     - pack_channels two-sort binning
  near_mf  - near-field channel-kernel matvec (slot space)
  lanczos  - near noise (m Lanczos iterations)
  far      - far fused MF+noise (tiled spread + 2 fwd FFT + ifft + interp)
  far_spread / far_fft / far_normal - far internals
  unpack   - slot -> [N] sort
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import math  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_PSE_N", 131072))
ITERS = int(os.environ.get("PROBE_PSE_ITERS", 10))


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
    print(json.dumps({"component": label, "ms": ms}), flush=True)
    return ms


def main():
    from uammd_tpu.core.box import box
    from uammd_tpu.engine.layout import pack_channels, unpack_values
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers.ibm import spread as direct_spread

    far_grid = int(os.environ.get("PROBE_PSE_FAR", 144))
    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.random((N, 3)) - 0.5) * L, jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius, far_grid=far_grid,
        tolerance=1e-4,
        lanczos_iterations=int(os.environ.get("PROBE_PSE_LANCZOS", 4)),
        pos=pos,
        n_strag=int(os.environ.get("PROBE_PSE_STRAG", 128)),
    )
    print(json.dumps({
        "far_grid": far_grid, "near_cap": be.spec.cap,
        "near_shape": be.spec.shape, "rcut": be.rcut, "xi": be.xi,
        "n_strag": be.spec.n_strag,
    }), flush=True)
    f = 0.01 * jnp.sin(pos)

    eps = np.float32(1e-6)

    # pack: feed position feedback
    def pack_body(p):
        cg = pack_channels(be.spec, p, f)
        return p + eps * cg.x[0, 0, 0, :3].sum()

    timed(pack_body, pos, "pack")

    cg = pack_channels(be.spec, pos, f)

    # near matvec in slot space
    def near_body(ch):
        if be.spec.n_strag:
            vx, vy, vz, sv3 = be.near_matvec_slots(cg, *ch[0], sf3=ch[1])
            return ((vx, vy, vz), sv3)
        v = be.near_matvec_slots(cg, *ch[0])
        return (v, ch[1])

    timed(near_body, (cg.channels, cg.schannels), "near_mf")

    # lanczos noise
    def noise_body(k):
        k, sub = jax.random.split(k)
        nx_, ny_, nz_, s3, _ = be._near_noise_slots(cg, sub)
        return jax.random.fold_in(k, jnp.int32(nx_[0, 0, 0, 0] * 0))

    timed(noise_body, jax.random.key(1),
          f"lanczos{be.lanczos_iterations}")

    # far fused
    def far_body(p):
        v = be.far.compute_mf_bdw(p, f, jax.random.key(3), 1.0)
        return p + eps * v

    timed(far_body, pos, "far_fused")

    # far internals
    kern = be.far._kernel(jnp.float32)

    def spread_body(p):
        g = direct_spread(kern, p, f, be.far.shape, be.far.box)
        return p + eps * g[0, 0, 0, 0]

    timed(spread_body, pos, "far_spread")

    g0 = direct_spread(kern, pos, f, be.far.shape, be.far.box)

    def fft_body(g):
        gk = jnp.fft.rfftn(g, axes=(0, 1, 2))
        return jnp.fft.irfftn(gk, s=be.far.shape, axes=(0, 1, 2))

    timed(fft_body, g0, "far_fft_roundtrip")

    def normal_body(k):
        k, sub = jax.random.split(k)
        w = jax.random.normal(sub, tuple(be.far.shape) + (3,), jnp.float32)
        return jax.random.fold_in(k, jnp.int32(w[0, 0, 0, 0] * 0))

    timed(normal_body, jax.random.key(4), "far_normalgen")

    def normal_body_rbg(k):
        w = jax.random.normal(k, tuple(be.far.shape) + (3,), jnp.float32)
        return jax.random.split(k)[0]

    timed(normal_body_rbg, jax.random.key(5, impl="rbg"), "far_normalgen_rbg")

    # unpack
    def unpack_body(v):
        out = unpack_values(cg, v)
        return tuple(x + eps * out[0, 0] for x in v)

    timed(unpack_body, tuple(cg.channels), "unpack")

    # full displacement
    def disp_body(p):
        dx, ovf = be.displacement(p, f, jax.random.key(7), 0.01, 1.0)
        return p + eps * dx

    timed(disp_body, pos, "full_em")

    # full displacement with the in-grid WCA pair force (bench path)
    from uammd_tpu.engine.md import lj_g_fused

    sigma = 2.0 * radius
    rc = 2.0 ** (1.0 / 6.0) * sigma
    force_slots = be.make_pair_force_slots(
        lj_g_fused(1.0, sigma, rc2=rc * rc, approx=True)
    )

    def disp_pair_body(p):
        dx, _f, ovf = be.displacement_with_pair_force(
            force_slots, p, jax.random.key(9), 0.01, 1.0
        )
        return b.wrap_position(p + dx * 0.01 + eps * dx)

    timed(disp_pair_body, pos, "full_em_pair")

    # persistent-binning EM step (near pid layout + far pencil bins carried)
    st0 = jax.jit(be.em_state)(pos)

    def disp_pair_persistent(carry):
        p, st = carry
        dx, _f, st = be.displacement_with_pair_force_persistent(
            force_slots, p, jax.random.key(9), 0.01, 1.0, st
        )
        return (b.wrap_position(p + dx * 0.01 + eps * dx), st)

    timed(disp_pair_persistent, (pos, st0), "full_em_pair_persistent")


if __name__ == "__main__":
    main()
