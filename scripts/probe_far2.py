"""Pencil far-field + near-pack breakdown probe:

- bin_pencils alone; spread/interp with prebuilt bins (slack 0/1, chunks)
- fused far pass with persistent bins
- near pack: full sort (pack_channels) vs gather-refresh from a stale pid
  layout (the slot-resident EM candidate)
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
    from uammd_tpu.engine.layout import pack_channels
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers import pencil_ibm as P

    far_grid = int(os.environ.get("PROBE_FAR_GRID", 144))
    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.random((N, 3)) - 0.5) * L, jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius, far_grid=far_grid,
        tolerance=1e-4, lanczos_iterations=4, pos=pos, n_strag=128,
    )
    far = be.far
    kern = far._kernel(jnp.float32)
    shape = tuple(far.shape)
    print(json.dumps({"far_grid": far_grid, "support": kern.support,
                      "cap": P.default_cap(N, shape)}), flush=True)
    f = 0.01 * jnp.sin(pos)
    eps = np.float32(1e-6)

    # 1. binning alone
    def bin_body(p):
        bins = P.bin_pencils(p, shape, far.box)
        return p + eps * (bins.pids[0, 0] * 0).astype(p.dtype)

    timed(bin_body, pos, "bin_pencils")

    bins0 = P.bin_pencils(pos, shape, far.box)

    # 2. spread/interp with prebuilt bins
    for slack in (0, 1):
        for chunk in (32, 64, 162, 324):
            def spread_body(p, slack=slack, chunk=chunk):
                g, _ = P.spread_pencil(kern, p, f, shape, far.box, bins0,
                                       chunk=chunk, slack=slack)
                return p + eps * g[0, 0, 0, 0]

            timed(spread_body, pos, f"spread_s{slack}_c{chunk}")

    g0, _ = P.spread_pencil(kern, pos, f, shape, far.box, bins0)

    for slack in (0, 1):
        for chunk in (32, 64, 162, 324):
            def interp_body(p, slack=slack, chunk=chunk):
                v, _ = P.interpolate_pencil(kern, p, g0, far.box, bins0,
                                            chunk=chunk, slack=slack)
                return p + eps * v

            timed(interp_body, pos, f"interp_s{slack}_c{chunk}")

    # 3. fused far pass, per-call binning vs persistent bins
    def far_body(p):
        v = far.compute_mf_bdw(p, f, jax.random.key(3), 1.0)
        return p + eps * v

    timed(far_body, pos, "far_fused_rebin")

    def far_body_p(p):
        v = far.compute_mf_bdw(p, f, jax.random.key(3), 1.0, bins=bins0,
                               slack=1)
        return p + eps * v

    timed(far_body_p, pos, "far_fused_persistent")

    # 4. near pack: sort vs gather-refresh
    def pack_body(p):
        cg = pack_channels(be.spec, p, jnp.zeros_like(p))
        return p + eps * cg.x[0, 0, 0, 0]

    timed(pack_body, pos, "pack_sort")

    cg0 = pack_channels(be.spec, pos, jnp.zeros_like(pos))

    def pack_gather(p):
        Ls = be.spec.box_size
        px = p[:, 0] - Ls[0] * jnp.round(p[:, 0] / Ls[0])
        py = p[:, 1] - Ls[1] * jnp.round(p[:, 1] / Ls[1])
        pz = p[:, 2] - Ls[2] * jnp.round(p[:, 2] / Ls[2])
        m = cg0.pid >= 0
        src = jnp.maximum(cg0.pid, 0)
        x = jnp.where(m, px[src], 1.0e9)
        y = jnp.where(m, py[src], 1.0e9)
        z = jnp.where(m, pz[src], 1.0e9)
        sm = cg0.spid >= 0
        ssrc = jnp.maximum(cg0.spid, 0)
        spos = jnp.where(sm[:, None], jnp.stack(
            [px[ssrc], py[ssrc], pz[ssrc]], -1), 1.0e9)
        return p + eps * (x[0, 0, 0, 0] + y[0, 0, 0, 0] + z[0, 0, 0, 0]
                          + spos[0, 0])

    timed(pack_gather, pos, "pack_gather_refresh")


if __name__ == "__main__":
    main()
