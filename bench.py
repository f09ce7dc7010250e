"""Headline benchmark: LJ liquid MD throughput (particle-steps/s).

Workload mirrors the reference benchmark (reference: examples/misc/
benchmark.cu:172-181): N = 2^20 LJ particles, box 128^3 (rho = 0.5),
VerletNVT Gronbech-Jensen, rcut 2.5, dt 0.01, single precision, on the
grid-resident Pallas engine (uammd_tpu.engine).

Protocol: melt the fcc start in a high-capacity engine (the crystal's cell
occupancy exceeds the liquid's), then repack into the steady-state engine
sized from the melted configuration and time that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's published number (~9.4e7
particle-steps/s on a GTX 980, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_PSTEPS = 9.4e7  # reference: examples/misc/benchmark.cu:8 on GTX 980


def sync(x):
    # NOTE: block_until_ready does not fully synchronize on the axon
    # platform; fetching a scalar does.
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main(n=1 << 20, steps=200, warmup_steps=300, temperature=1.5,
         chunk=100):
    import numpy as np

    from uammd_tpu.engine.layout import unpack
    from uammd_tpu.engine.md import make_lj_md
    from uammd_tpu.utils.lattices import lattice

    L = 128.0 * (n / (1 << 20)) ** (1 / 3)
    pos = lattice(n, L, "fcc")

    # phase 1: melt (crystal needs a larger CAP than the liquid)
    md_melt = make_lj_md(
        L, n, dt=0.004, temperature=temperature, pos=pos
    )
    gs = md_melt.init(pos, seed=0)
    for _ in range(warmup_steps // chunk):
        gs = md_melt.run(gs, chunk)
    sync(gs.x)
    assert not bool(jax.device_get(gs.overflow)), "melt phase overflow"

    # phase 2: repack into the steady-state engine (occupancy-sized CAP)
    # and time fixed-size compiled chunks
    melted_pos, melted_vel, _ = unpack(gs)
    md = make_lj_md(
        L, n, dt=0.01, temperature=temperature,
        pos=np.asarray(jax.device_get(melted_pos)),
    )
    gs = md.init(np.asarray(jax.device_get(melted_pos)), seed=1)
    gs = md.run(gs, chunk)  # compile + settle
    sync(gs.x)

    assert steps % chunk == 0
    t0 = time.perf_counter()
    for _ in range(steps // chunk):
        gs = md.run(gs, chunk)
    sync(gs.x)
    dt_s = time.perf_counter() - t0
    assert not bool(jax.device_get(gs.overflow)), "timed phase overflow"

    psteps = n * steps / dt_s
    print(
        json.dumps(
            {
                "metric": "lj_md_particle_steps_per_s",
                "value": psteps,
                "unit": "particle-steps/s",
                "vs_baseline": psteps / BASELINE_PSTEPS,
            }
        )
    )
    return psteps


if __name__ == "__main__":
    main(
        n=int(os.environ.get("BENCH_N", 1 << 20)),
        steps=int(os.environ.get("BENCH_STEPS", 200)),
    )
