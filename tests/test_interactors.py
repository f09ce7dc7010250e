"""Bonded / external / DPD / SPH interactor correctness."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import Computables
from uammd_tpu.interactors.bonded import (
    angular,
    bonded_forces,
    bonds,
    fene,
    harmonic,
    harmonic_fixed_point,
    torsional_fourier,
    torsional_harmonic,
)
from uammd_tpu.interactors.external import external_forces, gravity, harmonic_trap
from uammd_tpu.interactors.sph import SPHParams, sph_density, sph_forces
from uammd_tpu.neighbors.neighbor_list import build_neighbor_list
from uammd_tpu.potentials.dpd import DPD, dpd_forces


def test_harmonic_bond_force():
    pos = jnp.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
    b = bonds([[0, 1]], k=jnp.array([10.0]), r0=jnp.array([1.0]))
    fev = bonded_forces(
        harmonic, b, pos, computables=Computables(True, True, True)
    )
    # stretched by 0.5 -> |F| = k*0.5 = 5, pulling together
    np.testing.assert_allclose(fev.force[0], [5.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(fev.force[1], [-5.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(fev.energy.sum()), 0.5 * 10 * 0.25, rtol=1e-6)


def test_harmonic_bond_pbc():
    L = 10.0
    b_ = box(L)
    pos = jnp.array([[-4.8, 0.0, 0.0], [4.8, 0.0, 0.0]])  # distance 0.4 via pbc
    b = bonds([[0, 1]], k=jnp.array([1.0]), r0=jnp.array([0.0]))
    fev = bonded_forces(harmonic, b, pos, box=b_, computables=Computables(True, True))
    np.testing.assert_allclose(float(fev.energy.sum()), 0.5 * 0.4**2, rtol=1e-5)
    assert fev.force[0, 0] < 0  # pulled toward -x (through the boundary)


def test_fene_diverges_near_max_extension():
    b = bonds([[0, 1]], k=jnp.array([1.0]), r0=jnp.array([1.0]))
    e_near = bonded_forces(
        fene, b, jnp.array([[0.0, 0, 0], [0.99, 0, 0]]),
        computables=Computables(False, True),
    ).energy.sum()
    e_far = bonded_forces(
        fene, b, jnp.array([[0.0, 0, 0], [0.5, 0, 0]]),
        computables=Computables(False, True),
    ).energy.sum()
    assert float(e_near) > float(e_far) > 0


def test_angular_bond_equilibrium_and_force():
    theta0 = 2.0
    b = bonds([[0, 1, 2]], k=jnp.array([3.0]), theta0=jnp.array([theta0]))
    # place at equilibrium angle: zero force
    pos = jnp.array(
        [
            [math.cos(theta0), math.sin(theta0), 0.0],
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
        ]
    )
    fev = bonded_forces(angular, b, pos, computables=Computables(True, True))
    assert float(jnp.abs(fev.force).max()) < 1e-5
    # perturbed: energy grows
    pos2 = pos.at[0, 1].add(0.3)
    e2 = bonded_forces(angular, b, pos2, computables=Computables(False, True))
    assert float(e2.energy.sum()) > float(fev.energy.sum()) + 1e-4


@pytest.mark.parametrize("fn", [torsional_harmonic, torsional_fourier])
def test_torsional_bond_gradient_is_finite_and_zero_at_min(fn):
    from uammd_tpu.interactors.bonded import _dihedral_angle

    pos = jnp.array(
        [
            [1.0, 0.0, -1.0],
            [0.0, 0.0, -1.0],
            [0.0, 0.0, 0.0],
            [math.cos(0.7), math.sin(0.7), 1.0],
        ]
    )
    # set phi0 to the actual dihedral of this geometry -> harmonic minimum
    phi = float(_dihedral_angle(pos[None], None)[0])
    b = bonds([[0, 1, 2, 3]], k=jnp.array([2.0]), phi0=jnp.array([phi]))
    fev = bonded_forces(fn, b, pos, computables=Computables(True, True))
    assert bool(jnp.all(jnp.isfinite(fev.force)))
    if fn is torsional_harmonic:
        assert float(jnp.abs(fev.force).max()) < 1e-5
        np.testing.assert_allclose(float(fev.energy.sum()), 0.0, atol=1e-10)
        # perturb: energy rises
        e2 = bonded_forces(
            fn, b, pos.at[3, 1].add(0.4), computables=Computables(False, True)
        )
        assert float(e2.energy.sum()) > 1e-4


def test_fixed_point_bond():
    b = bonds(
        [[0]],
        k=jnp.array([4.0]),
        r0=jnp.array([0.0]),
        point=jnp.array([[1.0, 0.0, 0.0]]),
    )
    pos = jnp.array([[2.0, 0.0, 0.0]])
    fev = bonded_forces(
        harmonic_fixed_point, b, pos, computables=Computables(True, True)
    )
    np.testing.assert_allclose(fev.force[0], [-4.0, 0, 0], atol=1e-6)


def test_external_gravity_and_trap():
    st = make_state(np.array([[0.0, 0, 1.0], [0, 0, 2.0]]), mass=[1.0, 2.0])
    e_fn, f_fn = gravity((0, 0, -1.0))
    fev = external_forces(st, e_fn, f_fn, Computables(True, True))
    np.testing.assert_allclose(np.asarray(fev.force[:, 2]), [-1.0, -2.0], atol=1e-12)
    e_fn, _ = harmonic_trap(k=2.0)
    fev2 = external_forces(st, e_fn, computables=Computables(True, True))
    np.testing.assert_allclose(np.asarray(fev2.force[0]), [0, 0, -2.0], atol=1e-6)


def test_dpd_momentum_conservation_and_symmetry():
    rng = np.random.default_rng(0)
    n, L = 200, 6.0
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L)
    vel = jnp.asarray(rng.normal(0, 1, (n, 3)))
    b = box(L)
    nl = build_neighbor_list(pos, b, 1.0, skin_multiplier=1.0)
    p = DPD(cutoff=1.0, A=25.0, gamma=4.0, temperature=1.0, dt=0.01)
    fev = dpd_forces(p, pos, vel, nl, jnp.int32(7), box=b)
    total = np.asarray(jnp.sum(fev.force, axis=0))
    np.testing.assert_allclose(total, 0.0, atol=1e-8)
    # different step -> different random force
    fev2 = dpd_forces(p, pos, vel, nl, jnp.int32(8), box=b)
    assert float(jnp.abs(fev.force - fev2.force).max()) > 1e-6


def test_sph_density_uniform_and_force_direction():
    # uniform grid: density roughly uniform; compressed region pushes outward
    n = 5
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1).reshape(-1, 3)
    pos = jnp.asarray(g, jnp.float64) * 0.5
    L = n * 0.5
    b = box(L)
    mass = jnp.ones(pos.shape[0], pos.dtype) * 0.1
    nl = build_neighbor_list(pos, b, 2.0, skin_multiplier=1.0)
    p = SPHParams(support=1.0, gas_stiffness=10.0, rest_density=0.1)
    rho = sph_density(p, pos, mass, nl, box=b)
    assert float(jnp.std(rho) / jnp.mean(rho)) < 1e-6  # uniform lattice
    fev = sph_forces(p, pos, jnp.zeros_like(pos), mass, nl, box=b)
    np.testing.assert_allclose(np.asarray(jnp.sum(fev.force, 0)), 0.0, atol=1e-10)
