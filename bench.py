"""Headline benchmark: LJ liquid MD throughput (particle-steps/s).

Workload mirrors the reference benchmark (reference: examples/misc/
benchmark.cu:172-181): N = 2^20 LJ particles, box 128^3 (rho = 0.5),
VerletNVT Gronbech-Jensen, rcut 2.5, Verlet-list skin multiplier 1.2,
dt 0.01, single precision.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is against the reference's published number (~9.4e7
particle-steps/s on a GTX 980, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_PSTEPS = 9.4e7  # reference: examples/misc/benchmark.cu:8 on GTX 980


def main(n=1 << 20, steps=200, warmup=50):
    from uammd_tpu.core.box import box
    from uammd_tpu.core.state import make_state
    from uammd_tpu.integrators.base import run
    from uammd_tpu.integrators.verlet import initialize_velocities, nvt_gronbech_jensen
    from uammd_tpu.interactors.pair import pair_forces
    from uammd_tpu.neighbors.neighbor_list import (
        build_neighbor_list,
        ensure_capacity,
        maybe_rebuild,
    )
    from uammd_tpu.potentials.radial import lj
    from uammd_tpu.utils.lattices import lattice

    L = 128.0 * (n / (1 << 20)) ** (1 / 3)
    b = box(L)
    st = make_state(lattice(n, L, "fcc"), seed=0)
    st = initialize_velocities(st, 1.0)
    pot = lj(cutoff=2.5)
    nl = build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2)
    nl = ensure_capacity(nl, st.pos)

    def force_fn(state, nbrs):
        nbrs = maybe_rebuild(nbrs, state.pos)
        return pair_forces(pot, state.pos, nbrs), nbrs

    integ = nvt_gronbech_jensen(force_fn, dt=0.01, temperature=1.0, friction=1.0)
    st, nl = integ.init(st, nl)

    # warmup (also compiles the scan)
    st, nl, _ = run(integ, st, nl, warmup, initialize=False)
    jax.block_until_ready(st.pos)

    t0 = time.perf_counter()
    st, nl, _ = run(integ, st, nl, steps, initialize=False)
    jax.block_until_ready(st.pos)
    dt_s = time.perf_counter() - t0

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
    n = int(os.environ.get("BENCH_N", 1 << 20))
    steps = int(os.environ.get("BENCH_STEPS", 200))
    main(n=n, steps=steps)
