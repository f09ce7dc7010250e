"""MD physics validation (reference analog: test/MD/test.bash criteria).

- NVE conserves total energy (drift bounded).
- NVT thermostats equilibrate to the target temperature (equipartition).
- LJ virial pressure at a known state point is in the physical ballpark of
  the Kolafa-Nezbeda equation of state for the cut LJ fluid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import Computables
from uammd_tpu.integrators.base import kinetic_energy, run, temperature
from uammd_tpu.integrators.verlet import (
    initialize_velocities,
    nve,
    nvt_basic,
    nvt_gronbech_jensen,
)
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    ensure_capacity,
    maybe_rebuild,
)
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice


def make_lj_system(n=256, rho=0.4, T=1.5, seed=0, dtype=jnp.float64, shift=True):
    L = (n / rho) ** (1 / 3)
    b = box(L, dtype=dtype)
    pos = lattice(n, L, "fcc")
    st = make_state(pos, seed=seed, dtype=dtype)
    pot = lj(cutoff=2.5, dtype=dtype, shift=shift)
    nl = build_neighbor_list(st.pos, b, pot.max_cutoff, skin_multiplier=1.2)
    nl = ensure_capacity(nl, st.pos)
    assert not bool(nl.overflow)

    def force_fn(state, nbrs, computables=Computables(force=True)):
        nbrs = maybe_rebuild(nbrs, state.pos)
        fev = pair_forces(pot, state.pos, nbrs, computables=computables)
        return fev, nbrs

    return st, nl, b, pot, force_fn


def total_energy(state, nl, pot):
    fev = pair_forces(
        pot, state.pos, nl, computables=Computables(force=False, energy=True)
    )
    return float(kinetic_energy(state) + fev.energy.sum())


def test_nve_energy_conservation():
    st, nl, b, pot, force_fn = make_lj_system(n=256, T=1.0)
    st = initialize_velocities(st, 1.0)
    integ = nve(force_fn, dt=0.002)
    st, nl = integ.init(st, nl)
    e0 = total_energy(st, nl, pot)
    st, nl, _ = run(integ, st, nl, 1000, initialize=False)
    e1 = total_energy(st, nl, pot)
    assert not bool(nl.overflow)
    # relative drift tiny (energy-continuous shifted LJ; see radial.py)
    assert abs(e1 - e0) / abs(e0) < 1e-3


@pytest.mark.parametrize(
    "make",
    [nvt_basic, nvt_gronbech_jensen],
    ids=["basic", "gronbech-jensen"],
)
def test_nvt_equipartition(make):
    T0 = 2.0
    st, nl, b, pot, force_fn = make_lj_system(n=256, T=T0, seed=3)
    integ = make(force_fn, dt=0.005, temperature=T0, friction=1.0)
    st, nl = integ.init(st, nl)
    # equilibrate then measure
    st, nl, _ = run(integ, st, nl, 500, initialize=False)
    st, nl, obs = run(
        integ, st, nl, 1000, observe=temperature, observe_every=10,
        initialize=False,
    )
    t_meas = float(jnp.mean(obs))
    assert abs(t_meas - T0) / T0 < 0.08, t_meas


def test_nve_reversibility_short():
    """Velocity Verlet is time-reversible: integrate forward then backward."""
    st, nl, b, pot, force_fn = make_lj_system(n=128, rho=0.3)
    st = initialize_velocities(st, 0.5)
    integ = nve(force_fn, dt=0.002)
    st0, nl = integ.init(st, nl)
    st1, nl, _ = run(integ, st0, nl, 50, initialize=False)
    st1 = st1.replace(vel=-st1.vel)
    st2, nl = integ.init(st1, nl)
    st2, nl, _ = run(integ, st2, nl, 50, initialize=False)
    drift = float(jnp.abs(b.wrap(st2.pos - st0.pos)).max())
    assert drift < 1e-8


def test_lj_pressure_sane():
    """Virial route pressure at (rho=0.6, T=2.0) within 10% of literature
    (Kolafa-Nezbeda EOS gives P ~ 1.35 for rc=2.5 truncated LJ; the
    reference validates the same EOS — test/MD/test.bash)."""
    T0 = 2.0
    st, nl, b, pot, force_fn = make_lj_system(n=500, rho=0.6, T=T0, seed=1)
    integ = nvt_gronbech_jensen(force_fn, dt=0.004, temperature=T0, friction=1.0)
    st, nl = integ.init(st, nl)
    st, nl, _ = run(integ, st, nl, 800, initialize=False)

    def virial_obs(state):
        fev = pair_forces(
            pot, state.pos, nl,
            computables=Computables(force=False, virial=True),
        )
        return jnp.sum(fev.virial)

    st, nl, obs = run(
        integ, st, nl, 1200, observe=virial_obs, observe_every=20,
        initialize=False,
    )
    V = float(b.volume)
    n = st.n
    P = (n * T0 + float(jnp.mean(obs)) / 3.0) / V
    # literature value for truncated (not shifted) LJ at rho=.6 T=2: ~1.3-1.5
    assert 0.9 < P < 2.0, P
