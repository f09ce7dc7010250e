"""Monte Carlo: MALA sampling + Anderson checkerboard sweeps.

Reference analog: test/MC — MC vs BD/MD cross-validation of equilibrium
averages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import Computables
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.mc import AndersonMC, force_biased
from uammd_tpu.integrators.verlet import nvt_gronbech_jensen
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list, maybe_rebuild
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice


def test_mala_samples_harmonic_boltzmann():
    """Harmonic trap: <x^2> = T/k per dof."""
    T, k_spring = 0.8, 2.0
    n = 256
    st = make_state(np.zeros((n, 3)), seed=2, dtype=jnp.float64)

    def ef(state, aux):
        e = 0.5 * k_spring * jnp.sum(state.pos**2)
        f = -k_spring * state.pos
        return e, f, aux

    integ = force_biased(ef, dt=0.1, temperature=T)
    st, aux = integ.init(st, None)
    # burn-in + sample
    st, aux, _ = run(integ, st, aux, 300, initialize=False)
    st, aux, obs = run(
        integ, st, aux, 1500,
        observe=lambda s: jnp.mean(s.pos**2), observe_every=10,
        initialize=False,
    )
    var = float(jnp.mean(obs))
    np.testing.assert_allclose(var, T / k_spring, rtol=0.1)


def test_anderson_matches_md_energy():
    """LJ fluid mean potential energy: Anderson MC vs Langevin MD
    (reference: test/MC cross-validation)."""
    n, rho, T = 256, 0.35, 2.0
    L = (n / rho) ** (1 / 3)
    b = box(L, dtype=jnp.float64)
    pot = lj(cutoff=2.5, shift=True, dtype=jnp.float64)
    pos0 = lattice(n, L, "fcc")

    def pot_energy(pos, nl):
        fev = pair_forces(
            pot, pos, nl, computables=Computables(False, True)
        )
        return fev.energy.sum()

    # --- MD route
    st = make_state(pos0, seed=0, dtype=jnp.float64)
    nl = build_neighbor_list(st.pos, b, pot.max_cutoff)

    def force_fn(state, nbrs):
        nbrs = maybe_rebuild(nbrs, state.pos)
        return pair_forces(pot, state.pos, nbrs), nbrs

    integ = nvt_gronbech_jensen(force_fn, dt=0.004, temperature=T)
    st, nl = integ.init(st, nl)
    st, nl, _ = run(integ, st, nl, 3500, initialize=False)
    from uammd_tpu.neighbors.neighbor_list import rebuild_neighbor_list

    def obs_energy(s):
        return pot_energy(s.pos, rebuild_neighbor_list(nl, s.pos))

    st, nl, obs = run(
        integ, st, nl, 1000,
        observe=obs_energy, observe_every=20,
        initialize=False,
    )
    e_md = float(jnp.mean(obs)) / n

    # --- MC route
    st2 = make_state(pos0, seed=1, dtype=jnp.float64)
    mc = AndersonMC.create(b, pot, T, n, tries_per_cell=8)
    sweep = jax.jit(lambda s: mc.sweep(s, 10))
    st2 = sweep(st2)  # burn-in 10 sweeps
    es = []
    nl2 = build_neighbor_list(st2.pos, b, pot.max_cutoff)
    for _ in range(8):
        st2 = sweep(st2)
        nl2 = build_neighbor_list(st2.pos, b, pot.max_cutoff)
        es.append(float(pot_energy(st2.pos, nl2)) / n)
    e_mc = float(np.mean(es))
    assert abs(e_mc - e_md) < 0.15 * abs(e_md) + 0.05, (e_mc, e_md)


def test_anderson_autotune_reaches_target_acceptance():
    """Jump-size autotuning drives acceptance toward the target
    (reference: MonteCarlo/NVT/Anderson.cuh:55-57)."""
    n, rho, T = 256, 0.35, 2.0
    L = (n / rho) ** (1 / 3)
    b = box(L, dtype=jnp.float64)
    pot = lj(cutoff=2.5, shift=True, dtype=jnp.float64)
    pos0 = lattice(n, L, "fcc")
    st = make_state(pos0, seed=7, dtype=jnp.float64)
    mc = AndersonMC.create(b, pot, T, n, tries_per_cell=4,
                           jump=0.02)  # far too small: ~100% acceptance
    st, jump, rate = mc.sweep_autotune(st, n_sweeps=40,
                                       target_acceptance=0.5)
    rate = float(rate)
    jump = float(jump)
    assert jump > 0.05, jump  # tuned upward from 0.02
    assert 0.3 < rate < 0.7, rate
    assert bool(jnp.all(jnp.isfinite(st.pos)))
