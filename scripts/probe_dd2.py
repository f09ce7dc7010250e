"""Measure the DD v2 engine (parallel/domain2.py) on a 1-DEVICE mesh on the
real chip, next to the plain single-chip v2 engine — the halo-machinery
overhead as a number (VERDICT r4 weak #1 / next #1).

Three configs, same melted 1M LJ liquid (bench.py phases):
  A. production single-chip bench config (clt noise, cellcenter stragglers,
     fold_in_update) — the 1.2957e8 configuration;
  B. single-chip with the DD-matched settings (bm noise, min-image
     stragglers, separate fold pass) — ceteris-paribus baseline;
  C. the DD program on a 1-device mesh (halo ppermutes, ghost-row kernel,
     boundary reaction routing, per-shard RNG) — B + halo machinery.

C/B isolates the halo cost; C/A is the total gap to the production number.
Env: PROBE_DD2_N (default 1<<20), PROBE_DD2_STEPS (40), PROBE_DD2_CHUNK (10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N = int(os.environ.get("PROBE_DD2_N", 1 << 20))
STEPS = int(os.environ.get("PROBE_DD2_STEPS", 40))
CHUNK = int(os.environ.get("PROBE_DD2_CHUNK", 10))
WARM = int(os.environ.get("PROBE_DD2_WARM", 200))
T = 1.0


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from uammd_tpu.engine.layout import choose_spec, unpack
    from uammd_tpu.engine.md import make_lj_md
    from uammd_tpu.engine.md2 import GridMD2, make_lj_md2
    from uammd_tpu.parallel.domain2 import (
        make_domain_md2_step,
        shard_md2_state,
        _single_chip_md2,
    )
    from uammd_tpu.utils.lattices import lattice

    L = 128.0 * (N / (1 << 20)) ** (1 / 3)
    pos = lattice(N, L, "fcc")
    print(json.dumps({"stage": "melt_start"}), flush=True)
    md_melt = make_lj_md(L, N, dt=0.004, temperature=T, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(WARM // CHUNK):
        gs = md_melt.run(gs, CHUNK)
    sync(gs.x)
    assert not bool(jax.device_get(gs.overflow)), "melt overflow"
    mp = np.asarray(jax.device_get(unpack(gs)[0]))
    print(json.dumps({"n": N, "L": L, "melted": True}), flush=True)

    def timed_single(md, gs0, label):
        gs1 = md.run(gs0, CHUNK)
        sync(gs1.x)
        t0 = time.perf_counter()
        for _ in range(STEPS // CHUNK):
            gs1 = md.run(gs1, CHUNK)
        sync(gs1.x)
        ps = N * STEPS / (time.perf_counter() - t0)
        ovf = bool(jax.device_get(gs1.overflow))
        print(json.dumps({label: ps, "overflow": ovf}), flush=True)
        return ps

    # A: production bench config
    mdA = make_lj_md2(L, N, dt=0.01, temperature=T, pos=mp, n_strag=16,
                      noise="clt", fast_recip=True)
    psA = timed_single(mdA, mdA.init(mp, seed=1), "A_single_production")

    # B: DD-matched single chip (bm noise, no cellcenter, separate fold)
    spec = choose_spec(L, N, 2.5, skin=1.2, pos=mp, n_strag=16,
                       nz_multiple=1)
    mdB = _single_chip_md2(spec, 1.0, 1.0, 0.01, T, 1.0, 1.0, True, False)
    psB = timed_single(mdB, mdB.init(mp, seed=1), "B_single_dd_matched")

    # C: DD on the 1-device mesh
    print(json.dumps({"stage": "dd_setup"}), flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("z",))
    step, _ = make_domain_md2_step(
        mesh, spec, dt=0.01, temperature=T, friction=1.0, n_total=N,
        fast_recip=True, interpret=False,
    )
    gsB = mdB.init(mp, seed=1)
    state = shard_md2_state(mdB, gsB, mesh, seed=1)

    def chunk_run(st):
        def body(s, _):
            return step(*s), None
        return jax.lax.scan(body, st, None, length=CHUNK)[0]

    run = jax.jit(chunk_run)
    print(json.dumps({"stage": "dd_compile"}), flush=True)
    state = run(state)
    sync(state[0])
    t0 = time.perf_counter()
    for _ in range(STEPS // CHUNK):
        state = run(state)
    sync(state[0])
    psC = N * STEPS / (time.perf_counter() - t0)
    ovf = float(jax.device_get(jnp.max(state[18])))
    print(json.dumps({
        "C_dd_1dev_mesh": psC, "overflow": ovf != 0.0,
        "halo_overhead_vs_B": 1.0 - psC / psB,
        "total_gap_vs_A": 1.0 - psC / psA,
    }))


if __name__ == "__main__":
    main()
