"""Far-field (FCM/PSE far) internals probe: split the 648 ms fused pass
into tiled spread / interp / spectral elementwise, and measure lax.map
chunk-size sensitivity (suspected pole: per-iteration scan overhead,
27 maps x ~92 chunks in interp)."""

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
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers import tiled_ibm

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
    tile = tiled_ibm.pick_tile(shape, kern.support)
    print(json.dumps({"far_grid": far_grid, "tile": tile,
                      "support": kern.support,
                      "cap": tiled_ibm._default_cap(N, shape, tile)}),
          flush=True)
    f = 0.01 * jnp.sin(pos)
    eps = np.float32(1e-6)

    for chunk in (1024, 4096, 16384):
        def spread_body(p, chunk=chunk):
            g, _ = tiled_ibm.spread_tiled(
                kern, p, f, shape, far.box, chunk=chunk)
            return p + eps * g[0, 0, 0, 0]

        timed(spread_body, pos, f"spread_tiled_c{chunk}")

    g0, _ = tiled_ibm.spread_tiled(kern, pos, f, shape, far.box)

    for chunk in (512, 4096, 16384):
        def interp_body(p, chunk=chunk):
            v, _ = tiled_ibm.interpolate_tiled(
                kern, p, g0, far.box, chunk=chunk)
            return p + eps * v

        timed(interp_body, pos, f"interp_tiled_c{chunk}")


if __name__ == "__main__":
    main()
