"""LJ step component timing probe (round 3): isolate K1 / update / rebin
inside scans with honest carry dependencies. Run idle.

Variants:
  k1      - pair kernel only (x <- x + eps*fx feedback keeps the scan honest)
  update  - fused fold+GJ update only (force arrays fixed from carry)
  rebin   - separable rebin every iteration
  step    - full step (reference point)
  step_fast2 - full step with the restructured LJ radial (u4*(A u3 + B))
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 1 << 20
L = 128.0
TEMP = 1.5
ITERS = 200


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def lj_g_fast2(epsilon=1.0, sigma=1.0):
    """g = u^4 (A u^3 + B), u = 1/r2 hw-approx: one fewer mul chain than
    md.lj_g_fast's (2 s6^2 - s6) form."""
    from jax.experimental import pallas as pl

    s2 = np.float32(sigma * sigma)
    A = np.float32(-48.0 * epsilon * float(s2) ** 6)
    B = np.float32(24.0 * epsilon * float(s2) ** 3)

    def g(r2):
        u = pl.reciprocal(r2, approx=True)
        u2 = u * u
        u4 = u2 * u2
        u3 = u2 * u
        return u4 * (A * u3 + B)

    return g


def main():
    from uammd_tpu.engine.layout import unpack
    from uammd_tpu.engine.md import make_lj_md
    from uammd_tpu.engine.md2 import make_lj_md2
    from uammd_tpu.engine.rebin_kernel import rebin_fast3
    from uammd_tpu.utils.lattices import lattice

    which = sys.argv[1:] or ["k1", "update", "rebin", "step", "step_fast2"]
    pos = lattice(N, L, "fcc")
    md_melt = make_lj_md(L, N, dt=0.004, temperature=TEMP, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, 100)
    sync(gs.x)
    mp = np.asarray(jax.device_get(unpack(gs)[0]))
    print("# melt done", flush=True)

    md2 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                      n_strag=8, fast_recip=True,
                      fold_in_update=True, noise="clt")
    gs2 = md2.init(mp, seed=1)

    res = {}

    def timed(fn, g0, label):
        run = jax.jit(lambda g: jax.lax.scan(
            lambda c, _: (fn(c), None), g0, None, length=ITERS)[0])
        g1 = run(g0)
        sync(g1.x)
        t0 = time.perf_counter()
        g1 = run(g1)
        sync(g1.x)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        res[label] = ms
        print(json.dumps({"component": label, "ms": ms}), flush=True)

    eps = np.float32(1e-30)

    if "k1" in which:
        def k1_body(g):
            g = md2.compute_forces(g)
            return g.replace(x=g.x + eps * g.fx)
        timed(k1_body, gs2, "k1")

    if "update" in which:
        def upd_body(g):
            (x, y, z, wx, wy, wz), d2 = md2._update(
                g.x, g.y, g.z, g.vx, g.vy, g.vz,
                g.fx, g.fy, g.fz, g.fgrp, g.ref_x, g.ref_y, g.ref_z, g.step)
            return g.replace(x=x, y=y, z=z, vx=wx, vy=wy, vz=wz,
                             step=g.step + 1)
        timed(upd_body, gs2, "update")

    if "rebin" in which:
        timed(rebin_fast3, gs2, "rebin")

    if "step" in which:
        timed(md2.step, gs2, "step")

    if "step_fast2" in which:
        md3 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                          n_strag=8, fold_in_update=True, noise="clt")
        from uammd_tpu.engine.md2 import GridMD2
        md3 = GridMD2.create(
            md3.spec, md3.g_fn, dt=0.01, temperature=TEMP,
            g_fn_kernel=lj_g_fast2(), fold_in_update=True, noise="clt")
        gs3 = md3.init(mp, seed=1)
        timed(md3.step, gs3, "step_fast2")

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
