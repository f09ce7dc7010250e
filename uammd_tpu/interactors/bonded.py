"""Bonded interactions: 2-, 3- and 4-particle bonds (+ fixed-point bonds).

TPU-native redesign of the reference BondedForces family (reference:
src/Interactor/BondedForces.cuh:177, AngularBondedForces.cuh:148,
TorsionalBondedForces.cuh:245). The reference sorts bonds per particle and
hand-codes each bond type's force; here a bond type is just a vectorized
energy function

    energy_fn(r, params) -> [M] per-bond energies,  r: [M, p, 3]

and forces come from **autodiff** (F = -dE/dpos through the gather), which
makes angular/torsional gradients exact by construction. Accumulation back to
particles is the transpose of the gather (scatter-add), which XLA emits
automatically.

Fixed-point bonds (reference: BondedForces.cuh fixed-point mode) are p = 1
bonds whose anchor point lives in the parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.box import Box
from ..core.types import Computables, ForceEnergyVirial


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Bonds:
    """idx: [M, p] particle indices; params: pytree of [M]-leading arrays."""

    idx: jax.Array
    params: dict

    @property
    def particles_per_bond(self) -> int:
        return self.idx.shape[1]


def bonds(idx, **params) -> Bonds:
    idx = jnp.asarray(idx, jnp.int32)
    if idx.ndim == 1:
        idx = idx[:, None]
    return Bonds(idx=idx, params={k: jnp.asarray(v) for k, v in params.items()})


def bonded_forces(
    energy_fn,
    b: Bonds,
    pos: jax.Array,
    box: Box | None = None,
    computables: Computables = Computables(),
) -> ForceEnergyVirial:
    """Sum a bond energy function over all bonds; forces by reverse-mode AD.

    ``energy_fn(r, params, box)`` gets the gathered member positions
    [M, p, 3] and must be translation invariant (use box.wrap on differences).
    """
    n = pos.shape[0]
    p = b.particles_per_bond

    def total_energy(pos_):
        r = pos_[b.idx]  # [M, p, 3]
        return jnp.sum(energy_fn(r, b.params, box))

    force = None
    energy = None
    virial = None
    if computables.force or computables.virial:
        force = -jax.grad(total_energy)(pos)
    if computables.energy:
        e_b = energy_fn(pos[b.idx], b.params, box)  # [M]
        energy = (
            jnp.zeros(n, pos.dtype)
            .at[b.idx.reshape(-1)]
            .add(jnp.repeat(e_b / p, p), mode="drop")
        )
    if computables.virial:
        # virial per bond: sum_m F_m . (r_m - r_com); distribute evenly
        def member_forces(pos_):
            r = pos_  # [M, p, 3]
            return jnp.sum(energy_fn(r, b.params, box))

        r = pos[b.idx]
        f_m = -jax.grad(member_forces)(r)  # [M, p, 3]
        r_rel = r - jnp.mean(r, axis=1, keepdims=True)
        if box is not None:
            r_rel = box.wrap(r_rel)
        w_b = jnp.sum(f_m * r_rel, axis=(1, 2))  # [M]
        virial = (
            jnp.zeros(n, pos.dtype)
            .at[b.idx.reshape(-1)]
            .add(jnp.repeat(w_b / p, p), mode="drop")
        )
    return ForceEnergyVirial(force=force, energy=energy, virial=virial)


# ---------------------------------------------------------------- bond types
def _wrap(dr, box):
    return box.wrap(dr) if box is not None else dr


def harmonic(r, params, box=None):
    """U = 0.5 k (|r| - r0)^2 (reference: BondedForces.cuh:68 harmonicBond)."""
    dr = _wrap(r[:, 1] - r[:, 0], box)
    d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-32)
    return 0.5 * params["k"] * (d - params["r0"]) ** 2


def fene(r, params, box=None):
    """U = -0.5 k r0^2 log(1 - r^2/r0^2) (reference: BondedForces.cuh:133).

    Note the reference feneEnergy uses prefactor 0.25 with its k convention;
    here we follow the standard FENE form (factor 0.5).
    """
    dr = _wrap(r[:, 1] - r[:, 0], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    r02 = params["r0"] ** 2
    x = jnp.clip(r2 / r02, 0.0, 1.0 - 1e-6)
    return -0.5 * params["k"] * r02 * jnp.log1p(-x)


def harmonic_fixed_point(r, params, box=None):
    """p=1 bond to a fixed anchor (reference: fixed-point BondedForces)."""
    dr = _wrap(r[:, 0] - params["point"], box)
    d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-32)
    return 0.5 * params["k"] * (d - params["r0"]) ** 2


def angular(r, params, box=None):
    """U = 2 k (sin(theta/2) - sin(theta0/2))^2 over the i-j-k angle
    (reference: AngularBondedForces.cuh:109-114; reduces to k(1-cos theta)
    for theta0 = 0)."""
    rij = _wrap(r[:, 0] - r[:, 1], box)
    rkj = _wrap(r[:, 2] - r[:, 1], box)
    c = jnp.sum(rij * rkj, axis=-1) / jnp.sqrt(
        jnp.sum(rij * rij, axis=-1) * jnp.sum(rkj * rkj, axis=-1) + 1e-32
    )
    theta = jnp.arccos(jnp.clip(c, -1.0 + 1e-7, 1.0 - 1e-7))
    return 2.0 * params["k"] * (
        jnp.sin(0.5 * theta) - jnp.sin(0.5 * params["theta0"])
    ) ** 2


def _dihedral_angle(r, box):
    r12 = _wrap(r[:, 1] - r[:, 0], box)
    r23 = _wrap(r[:, 2] - r[:, 1], box)
    r34 = _wrap(r[:, 3] - r[:, 2], box)
    n1 = jnp.cross(r12, r23)
    n2 = jnp.cross(r23, r34)
    m1 = jnp.cross(n1, r23 / jnp.linalg.norm(r23, axis=-1, keepdims=True))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def torsional_harmonic(r, params, box=None):
    """U = 0.5 k (phi - phi0)^2 (reference: TorsionalBondedForces.cuh:60-102)."""
    phi = _dihedral_angle(r, box)
    dphi = phi - params["phi0"]
    dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
    return 0.5 * params["k"] * dphi**2


def torsional_fourier(r, params, box=None):
    """LAMMPS-style U = k (1 + cos(phi - phi0)) (reference:
    TorsionalBondedForces.cuh:131-184 FourierLAMMPS)."""
    phi = _dihedral_angle(r, box)
    return params["k"] * (1.0 + jnp.cos(phi - params["phi0"]))
