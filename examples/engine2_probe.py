"""Perf probe: v2 LJ engine (Newton kernel + stragglers + fused update) at
N = 2^20 on the real TPU — the round-2 headline measurement.

Protocol identical to bench.py: melt on a high-CAP v1 engine, repack the
melted liquid into the v2 engine (CAP from the occupancy quantile,
stragglers for the tail), time fixed chunks.

Env: PROBE_N, PROBE_STEPS, PROBE_CAP, PROBE_STRAG.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from uammd_tpu.engine.md2 import make_lj_md2
from uammd_tpu.utils.lattices import lattice


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main(n, T=1.5, steps=100, cap=None, n_strag=32):
    L = 128.0 * (n / (1 << 20)) ** (1 / 3)
    pos = lattice(n, L, "fcc")

    t0 = time.perf_counter()
    md_melt = make_lj_md(L, n, dt=0.004, temperature=T, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, 100)
    sync(gs.x)
    assert not bool(jax.device_get(gs.overflow)), "melt overflow"
    mp, _, _ = unpack(gs)
    mp = np.asarray(jax.device_get(mp))
    print(f"melt done in {time.perf_counter()-t0:.0f}s", flush=True)

    md = make_lj_md2(L, n, dt=0.01, temperature=T, cap=cap,
                     n_strag=n_strag, pos=mp,
                     fast_recip=bool(os.environ.get("PROBE_FAST_RECIP")))
    print(f"v2 spec: {md.spec}", flush=True)
    t0 = time.perf_counter()
    gs2 = md.init(mp, seed=1)
    gs2 = md.run(gs2, steps)
    sync(gs2.x)
    print(f"v2 compile+warm: {time.perf_counter()-t0:.0f}s "
          f"(overflow={bool(jax.device_get(gs2.overflow))})", flush=True)
    n_s = int(jax.device_get(jnp.sum(gs2.spid >= 0)))
    print(f"stragglers in flight: {n_s}", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        gs2 = md.run(gs2, steps)
    sync(gs2.x)
    dt_s = (time.perf_counter() - t0) / (3 * steps)
    T_meas = float(jax.device_get(md.temperature_of(gs2)))
    n_final = int(jax.device_get(
        (gs2.pid >= 0).sum() + (gs2.spid >= 0).sum()))
    print(
        f"v2 GJ step: {dt_s*1e3:.2f} ms -> {n/dt_s:.4e} psteps/s "
        f"(overflow={bool(jax.device_get(gs2.overflow))}, "
        f"T={T_meas:.3f}, count={n_final}, "
        f"strag={int(jax.device_get((gs2.spid >= 0).sum()))})",
        flush=True,
    )
    import math as _m
    assert _m.isfinite(T_meas) and abs(T_meas - T) < 0.1 * T, T_meas
    assert n_final == n, n_final
    print("PHYSICS OK", flush=True)


if __name__ == "__main__":
    cap = os.environ.get("PROBE_CAP")
    main(
        n=int(os.environ.get("PROBE_N", 1 << 20)),
        steps=int(os.environ.get("PROBE_STEPS", 100)),
        cap=int(cap) if cap else None,
        n_strag=int(os.environ.get("PROBE_STRAG", 32)),
    )
