"""Anderson-MC vs BD sampling-efficiency probe (VERDICT r2 item 9).

Measures, on the same LJ fluid:
- Anderson checkerboard MC: sweeps/s, trial-moves/s, acceptance rate
  (reference: src/Integrator/MonteCarlo/NVT/Anderson.cuh:47);
- overdamped BD (Leimkuhler): particle-steps/s;
- sampling efficiency: both start from the same compressed lattice and
  relax toward the equilibrium potential energy; the figure of merit is
  wall-seconds per e-fold of (U - U_eq) decay — "how fast does each
  sampler actually move through configuration space per second".

Env: PROBE_MC_N (default 32768), PROBE_MC_RHO (0.4), PROBE_MC_T (1.5).
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

N = int(os.environ.get("PROBE_MC_N", 32768))
RHO = float(os.environ.get("PROBE_MC_RHO", 0.4))
T = float(os.environ.get("PROBE_MC_T", 1.5))


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from uammd_tpu.core.box import box
    from uammd_tpu.core.state import make_state
    from uammd_tpu.core.types import Computables
    from uammd_tpu.integrators.base import run
    from uammd_tpu.integrators.brownian import leimkuhler
    from uammd_tpu.integrators.mc import AndersonMC
    from uammd_tpu.interactors.pair import pair_forces
    from uammd_tpu.neighbors.neighbor_list import (
        build_neighbor_list, ensure_capacity, maybe_rebuild)
    from uammd_tpu.potentials.radial import lj
    from uammd_tpu.utils.lattices import lattice

    L = (N / RHO) ** (1.0 / 3.0)
    b = box(L)
    pot = lj(cutoff=2.5, shift=True)
    # compressed start: same configuration for both samplers
    pos0 = jnp.asarray(lattice(N, 0.97 * L, "fcc"), jnp.float32)
    st0 = make_state(pos0, seed=11)
    print(json.dumps({"n": N, "rho": RHO, "T": T, "L": L}), flush=True)

    nl = build_neighbor_list(pos0, b, pot.max_cutoff, skin_multiplier=1.2)
    nl = ensure_capacity(nl, pos0)

    def force_fn(state, nbrs):
        nbrs = maybe_rebuild(nbrs, state.pos)
        return pair_forces(pot, state.pos, nbrs, box=b), nbrs

    @jax.jit
    def energy_of(pos, nbrs):
        nbrs = maybe_rebuild(nbrs, pos)
        fev = pair_forces(pot, pos, nbrs, box=b,
                          computables=Computables(force=False, energy=True))
        return fev.energy.sum(), nbrs

    # ---------------- BD throughput + relaxation trace
    integ = leimkuhler(force_fn, dt=5e-4, temperature=T)
    st, aux = jax.jit(integ.init)(st0, nl)
    chunk = 50
    st, aux, _ = run(integ, st, aux, chunk, initialize=False)  # warm
    sync(st.pos)
    t0 = time.perf_counter()
    st, aux, _ = run(integ, st, aux, chunk, initialize=False)
    sync(st.pos)
    bd_sps = chunk / (time.perf_counter() - t0)
    print(json.dumps({"bd_steps_per_s": bd_sps,
                      "bd_psteps_per_s": bd_sps * N}), flush=True)

    st, aux = st0, nl
    st, aux = jax.jit(integ.init)(st, aux)
    bd_trace, bd_t = [], []
    tstart = time.perf_counter()
    for i in range(24):
        st, aux, _ = run(integ, st, aux, chunk, initialize=False)
        # leimkuhler aux = (prev_noise, user_aux)
        e, nbrs_e = energy_of(st.pos, aux[1])
        aux = (aux[0], nbrs_e)
        bd_trace.append(float(jax.device_get(e)))
        bd_t.append(time.perf_counter() - tstart)
    print(json.dumps({"bd_U_trace": bd_trace, "bd_wall_s": bd_t}), flush=True)

    # ---------------- Anderson MC throughput + relaxation trace
    mc = AndersonMC.create(b, pot, T, N)
    st = st0
    st2, jump, rate = mc.sweep_autotune(st, n_sweeps=4)
    sync(st2.pos)
    t0 = time.perf_counter()
    st2b, jump, rate = mc.sweep_autotune(st2, n_sweeps=4, jump=jump)
    sync(st2b.pos)
    sweeps_ps = 4 / (time.perf_counter() - t0)
    n_cells = int(np.prod(mc.grid_shape))
    trials_ps = sweeps_ps * n_cells * mc.tries_per_cell
    print(json.dumps({
        "mc_sweeps_per_s": sweeps_ps,
        "mc_trial_moves_per_s": trials_ps,
        "mc_acceptance": float(jax.device_get(rate)),
        "mc_jump": float(jax.device_get(jump)),
        "mc_grid": list(mc.grid_shape), "mc_cap": mc.cap,
    }), flush=True)

    st, nbrs = st0, nl
    mc_trace, mc_t = [], []
    tstart = time.perf_counter()
    for i in range(24):
        st, jump, rate = mc.sweep_autotune(st, n_sweeps=2, jump=jump)
        e, nbrs = energy_of(st.pos, nbrs)
        mc_trace.append(float(jax.device_get(e)))
        mc_t.append(time.perf_counter() - tstart)
    print(json.dumps({"mc_U_trace": mc_trace, "mc_wall_s": mc_t}), flush=True)

    # ---------------- efficiency: wall-seconds per e-fold of |U - U_eq|
    def efold_time(trace, ts):
        u = np.asarray(trace)
        ueq = u[-4:].mean()
        d = np.abs(u - ueq)
        d0 = d[0]
        if d0 <= 0:
            return float("nan")
        below = np.nonzero(d < d0 / np.e)[0]
        return float(ts[below[0]]) if len(below) else float("nan")

    print(json.dumps({
        "bd_efold_wall_s": efold_time(bd_trace, bd_t),
        "mc_efold_wall_s": efold_time(mc_trace, mc_t),
    }), flush=True)


if __name__ == "__main__":
    main()
