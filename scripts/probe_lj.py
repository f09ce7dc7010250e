"""LJ engine variant probe (round 3): measure step-time for K1/update
variants on the real TPU. Run idle (nothing else on the host core).

Usage: python scripts/probe_lj.py [variant ...]
Variants: base foldup foldup_clt foldup_clt_s8
Writes one JSON line per variant to stdout (and /tmp/probe_lj.jsonl).
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    _ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402

N = 1 << 20
L = 128.0
TEMP = 1.5
CHUNK = 100
STEPS = 200

VARIANTS = {
    "base": dict(fold_in_update=False, noise="bm", n_strag=16),
    "foldup": dict(fold_in_update=True, noise="bm", n_strag=16),
    "foldup_clt": dict(fold_in_update=True, noise="clt", n_strag=16),
    "foldup_clt_s8": dict(fold_in_update=True, noise="clt", n_strag=8),
}


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from uammd_tpu.engine.layout import unpack
    from uammd_tpu.engine.md import make_lj_md
    from uammd_tpu.engine.md2 import make_lj_md2
    from uammd_tpu.utils.lattices import lattice

    names = sys.argv[1:] or list(VARIANTS)
    pos = lattice(N, L, "fcc")
    t0 = time.perf_counter()
    md_melt = make_lj_md(L, N, dt=0.004, temperature=TEMP, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, CHUNK)
    sync(gs.x)
    print(f"# melt done in {time.perf_counter() - t0:.0f}s", flush=True)
    mp = np.asarray(jax.device_get(unpack(gs)[0]))

    out_path = "/tmp/probe_lj.jsonl"
    for name in names:
        cfg = dict(VARIANTS[name])
        t0 = time.perf_counter()
        md2 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                          fast_recip=True, **cfg)
        gs2 = md2.init(mp, seed=1)
        gs2 = md2.run(gs2, CHUNK)
        sync(gs2.x)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(STEPS // CHUNK):
            gs2 = md2.run(gs2, CHUNK)
        sync(gs2.x)
        dt_step = (time.perf_counter() - t0) / STEPS
        T = float(jax.device_get(md2.temperature_of(gs2)))
        ovf = bool(jax.device_get(gs2.overflow))
        rec = {
            "variant": name, "ms_per_step": dt_step * 1e3,
            "psteps_per_s": N / dt_step, "T": T, "overflow": ovf,
            "cap": md2.spec.cap, "compile_s": round(compile_s, 1),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
