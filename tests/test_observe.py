"""In-engine energy/virial/stress observables vs the generic pair path
(reference: Interactor.cuh:94-103 computes force/energy/virial/stress
through one transverser; test cross-validates the two implementations)."""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.core.box import box
from uammd_tpu.core.types import Computables
from uammd_tpu.engine import layout
from uammd_tpu.engine.md2 import make_lj_md2
from uammd_tpu.engine.observe import (
    lj_pressure,
    observe_energy_virial_stress,
)
from uammd_tpu.interactors.pair import pair_forces
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list
from uammd_tpu.potentials.radial import lj
from uammd_tpu.utils.lattices import lattice


def liquidish(n, L, seed=0, jitter=0.3):
    rng = np.random.default_rng(seed)
    pos = np.asarray(lattice(n, L, "fcc"))
    return jnp.asarray(pos + jitter * rng.standard_normal(pos.shape),
                       jnp.float32)


def test_generic_stress_trace_is_virial():
    n, L = 200, 10.0
    pos = liquidish(n, L)
    b = box(L)
    pot = lj(cutoff=2.5)
    nl = build_neighbor_list(pos, b, pot.max_cutoff)
    fev = pair_forces(
        pot, pos, nl,
        computables=Computables(force=True, energy=True, virial=True,
                                stress=True),
    )
    assert fev.stress.shape == (n, 6)
    trace = fev.stress[:, 0] + fev.stress[:, 3] + fev.stress[:, 5]
    np.testing.assert_allclose(
        np.asarray(trace), np.asarray(fev.virial), rtol=1e-5, atol=1e-8
    )


def test_engine_observables_match_generic():
    n, L = 600, 12.0
    pos = liquidish(n, L)
    md = make_lj_md2(L, n, dt=0.004, temperature=0.0, cap=8, n_strag=128,
                     pos=pos)
    gs = md.init(pos, seed=0)
    en, vir, stress = observe_energy_virial_stress(
        gs, md.g_fn, _lj_e(), interpret=True
    )

    b = box(L)
    pot = lj(cutoff=2.5)
    nl = build_neighbor_list(pos, b, pot.max_cutoff)
    fev = pair_forces(
        pot, pos, nl,
        computables=Computables(force=True, energy=True, virial=True,
                                stress=True),
    )
    # engine state is pid-ordered = input order
    np.testing.assert_allclose(np.asarray(en), np.asarray(fev.energy),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vir), np.asarray(fev.virial),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(stress), np.asarray(fev.stress),
                               rtol=2e-4, atol=2e-4)


def _lj_e():
    from uammd_tpu.engine.md import lj_e

    return lj_e()


def test_lj_pressure_sign_and_ideal_limit():
    """A dilute random gas (no overlaps) has P ~ rho kT."""
    n, L = 64, 40.0
    rng = np.random.default_rng(3)
    # sc lattice, well separated: cutoff 2.5 << spacing 5
    g = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1)
    pos = jnp.asarray(
        (g.reshape(-1, 3) + 0.5) * 10.0 - L / 2 + 0.1 * rng.random((64, 3)),
        jnp.float32,
    )
    md = make_lj_md2(L, n, dt=0.004, temperature=1.0, pos=pos, n_strag=0)
    gs = md.init(pos, seed=0)
    P, E = lj_pressure(gs, temperature=1.0, interpret=True)
    rho = n / L**3
    np.testing.assert_allclose(float(P), rho * 1.0, rtol=1e-3)
    assert abs(float(E)) < 1e-4
