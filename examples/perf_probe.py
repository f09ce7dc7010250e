"""Perf probe: component timings + occupancy stats for the LJ engine at 1M.

Run on the real TPU: python examples/perf_probe.py
Prints occupancy stats (to size CAP), full-step time, and component times
(force kernel, noise generation, rebin). Drives the CAP / op-count decisions
documented in docs/PERF.md.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from uammd_tpu.engine.layout import unpack
from uammd_tpu.engine.md import make_lj_md
from uammd_tpu.engine.rebin_kernel import rebin_fast_noforce
from uammd_tpu.utils.lattices import lattice


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def occ_stats(spec, p):
    Ls = spec.box_size
    nx, ny, nz = spec.shape
    idx = [
        np.clip(((p[:, d] / Ls[d] + 0.5) % 1.0 * nd).astype(np.int64), 0, nd - 1)
        for d, nd in enumerate((nx, ny, nz))
    ]
    flat = (idx[2] * ny + idx[1]) * nx + idx[0]
    c = np.bincount(flat, minlength=nx * ny * nz)
    return dict(
        max=int(c.max()), mean=float(c.mean()), std=float(c.std()),
        frac_gt16=float((c > 16).mean()), frac_gt20=float((c > 20).mean()),
        frac_gt24=float((c > 24).mean()),
    )


def time_chunks(fn, arg, steps_per_call, ncalls):
    out = fn(arg)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ncalls):
        out = fn(out) if not isinstance(out, tuple) else fn(out)
    sync(out)
    return (time.perf_counter() - t0) / (ncalls * steps_per_call)


def main(n=1 << 20, T=1.5, cap_try=None):
    L = 128.0 * (n / (1 << 20)) ** (1 / 3)
    pos = lattice(n, L, "fcc")

    t0 = time.perf_counter()
    md_melt = make_lj_md(L, n, dt=0.004, temperature=T, pos=pos)
    print("melt spec:", md_melt.spec, flush=True)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, 100)
    sync(gs.x)
    assert not bool(jax.device_get(gs.overflow)), "melt overflow"
    print(f"melt done in {time.perf_counter()-t0:.0f}s", flush=True)

    mp, _, _ = unpack(gs)
    mp = np.asarray(jax.device_get(mp))
    print("melted occ:", occ_stats(md_melt.spec, mp), flush=True)

    md = make_lj_md(L, n, dt=0.01, temperature=T, pos=mp)
    print("steady spec:", md.spec, flush=True)
    gs = md.init(mp, seed=1)
    gs = md.run(gs, 100)
    sync(gs.x)

    dt_s = time_chunks(lambda g: md.run(g, 100), gs, 100, 3)
    print(f"full GJ step: {dt_s*1e3:.2f} ms -> {n/dt_s:.3e} psteps/s", flush=True)
    gs = md.run(gs, 100)
    assert not bool(jax.device_get(gs.overflow)), "steady overflow"
    p2, _, _ = unpack(gs)
    print("steady occ:", occ_stats(md.spec, np.asarray(jax.device_get(p2))),
          flush=True)

    # ---- components
    @jax.jit
    def force_loop(c):
        def body(c, _):
            x, y, z = c
            f = md.force_kernel(x, y, z)
            return (x + 1e-30 * f[0], y + 1e-30 * f[1], z + 1e-30 * f[2]), None
        c, _ = jax.lax.scan(body, c, None, length=50)
        return c

    dt_f = time_chunks(force_loop, (gs.x, gs.y, gs.z), 50, 3)
    print(f"force kernel: {dt_f*1e3:.2f} ms", flush=True)

    def make_noise_loop(key):
        @jax.jit
        def noise_loop(carry):
            key, acc = carry
            def body(c, _):
                k, a = c
                k, sub = jax.random.split(k)
                n1 = jax.random.normal(sub, gs.x.shape, jnp.float32)
                n2 = jax.random.normal(jax.random.fold_in(sub, 1), gs.x.shape, jnp.float32)
                n3 = jax.random.normal(jax.random.fold_in(sub, 2), gs.x.shape, jnp.float32)
                return (k, a + n1[0, 0, 0, 0] + n2[0, 0, 0, 0] + n3[0, 0, 0, 0]), None
            c, _ = jax.lax.scan(body, (key, acc), None, length=50)
            return c
        return noise_loop

    for impl in ("rbg", "threefry2x32"):
        key = jax.random.key(0, impl=impl)
        loop = make_noise_loop(key)
        dt_n = time_chunks(loop, (key, jnp.float32(0)), 50, 3)
        print(f"noise 3x[slots] ({impl}): {dt_n*1e3:.2f} ms", flush=True)

    @jax.jit
    def rebin_loop(g):
        def body(g, _):
            return rebin_fast_noforce(g), None
        g, _ = jax.lax.scan(body, g, None, length=10)
        return g

    dt_r = time_chunks(rebin_loop, gs, 10, 3)
    print(f"rebin (noforce): {dt_r*1e3:.2f} ms", flush=True)

    # ---- optional CAP variant
    if cap_try:
        md2 = make_lj_md(L, n, dt=0.01, temperature=T, cap=int(cap_try))
        print("cap-try spec:", md2.spec, flush=True)
        gs2 = md2.init(mp, seed=2)
        gs2 = md2.run(gs2, 100)
        sync(gs2.x)
        ovf = bool(jax.device_get(gs2.overflow))
        print("cap-try overflow after 100 steps:", ovf, flush=True)
        if not ovf:
            dt2 = time_chunks(lambda g: md2.run(g, 100), gs2, 100, 3)
            gs2 = md2.run(gs2, 100)
            print(f"cap={cap_try} step: {dt2*1e3:.2f} ms -> {n/dt2:.3e} "
                  f"psteps/s (overflow={bool(jax.device_get(gs2.overflow))})",
                  flush=True)


if __name__ == "__main__":
    main(
        n=int(os.environ.get("PROBE_N", 1 << 20)),
        cap_try=os.environ.get("PROBE_CAP"),
    )
