"""Radial pair potentials.

TPU-native analog of the reference Potential namespace (reference:
src/Interactor/Potential/RadialPotential.cuh:18-53, Potential.cuh:25-85,
ParameterHandler.cuh:8). A radial potential here is a small dataclass exposing

    energy(r2, ti, tj)        -> per-pair energy
    force_div_r(r2, ti, tj)   -> g = (1/r) dE/dr
    cutoff2(ti, tj)           -> squared cutoff for that type pair
    max_cutoff                -> scalar bound used to size neighbour lists

Force convention (documented once, used everywhere): with dr = r_j - r_i,
the force on particle i from j is  F_i = g(r) * dr.  For a repulsive core
dE/dr < 0 so F_i points away from j. Per-pair virial is -g*r^2 (equals
F_ij . r_ij), split half to each particle.

Per-type-pair parameters are dense [T, T] tables (the reference's
BasicParameterHandler, ParameterHandler.cuh:8); a [T, T] table lookup is a
tiny gather the TPU handles inline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _table(x, dtype=None):
    """Accept scalar or [T,T] table; return jnp array (0-d or 2-d)."""
    a = jnp.asarray(x, dtype=dtype)
    return a


def _lookup(tab: jax.Array, ti, tj):
    if tab.ndim == 0:
        return tab
    return tab[ti, tj]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LennardJones:
    """12-6 LJ with per-type-pair epsilon/sigma/cutoff (reference:
    src/Interactor/Potential/Potential.cuh:84 ``Potential::LJ``).

    ``shift=True`` subtracts E(rc) so the energy is continuous at the cutoff.
    """

    epsilon: jax.Array
    sigma: jax.Array
    cutoff: jax.Array
    shift: bool = dataclasses.field(default=False, metadata={"static": True})

    @property
    def max_cutoff(self) -> float:
        return float(jax.device_get(jnp.max(self.cutoff)))

    def cutoff2(self, ti, tj):
        rc = _lookup(self.cutoff, ti, tj)
        return rc * rc

    def _terms(self, r2, ti, tj):
        sigma = _lookup(self.sigma, ti, tj)
        eps = _lookup(self.epsilon, ti, tj)
        invr2 = sigma * sigma / r2
        invr6 = invr2 * invr2 * invr2
        return eps, sigma, invr2, invr6

    def energy(self, r2, ti, tj):
        eps, _, _, invr6 = self._terms(r2, ti, tj)
        e = 4.0 * eps * (invr6 * invr6 - invr6)
        if self.shift:
            rc2 = self.cutoff2(ti, tj)
            sigma = _lookup(self.sigma, ti, tj)
            ic6 = (sigma * sigma / rc2) ** 3
            e = e - 4.0 * eps * (ic6 * ic6 - ic6)
        return e

    def force_div_r(self, r2, ti, tj):
        eps, sigma, invr2, invr6 = self._terms(r2, ti, tj)
        # dE/dr / r = -24 eps (2 s^12/r^14 - s^6/r^8) = -(24 eps / r2)(2 invr12 - invr6)
        return -(24.0 * eps / r2) * (2.0 * invr6 * invr6 - invr6)


def lj(epsilon=1.0, sigma=1.0, cutoff=2.5, shift=False, dtype=jnp.float32):
    return LennardJones(
        epsilon=_table(epsilon, dtype),
        sigma=_table(sigma, dtype),
        cutoff=_table(cutoff, dtype),
        shift=shift,
    )


def wca(epsilon=1.0, sigma=1.0, dtype=jnp.float32):
    """Purely repulsive WCA: LJ cut+shifted at 2^(1/6) sigma (used by the
    Deserno membrane model, reference: src/misc/Deserno.cuh)."""
    rc = 2.0 ** (1.0 / 6.0) * jnp.asarray(sigma, dtype)
    return LennardJones(
        epsilon=_table(epsilon, dtype),
        sigma=_table(sigma, dtype),
        cutoff=_table(rc, dtype),
        shift=True,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Tabulated:
    """Potential from tabulated E(r) and g(r)=(1/r)dE/dr on a uniform r^2 grid.

    TPU analog of the reference TabulatedFunction texture lookups
    (reference: src/misc/TabulatedFunction.cuh:78): linear interpolation in
    r^2 avoids a sqrt in the hot loop.
    """

    r2_max: jax.Array  # scalar
    energy_table: jax.Array  # [M]
    g_table: jax.Array  # [M]
    cutoff: jax.Array  # scalar

    @property
    def max_cutoff(self) -> float:
        return float(jax.device_get(self.cutoff))

    def cutoff2(self, ti, tj):
        return self.cutoff * self.cutoff

    def _interp(self, tab, r2):
        m = tab.shape[0]
        x = jnp.clip(r2 / self.r2_max, 0.0, 1.0) * (m - 1)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, m - 2)
        w = x - i0
        return tab[i0] * (1 - w) + tab[i0 + 1] * w

    def energy(self, r2, ti, tj):
        return self._interp(self.energy_table, r2)

    def force_div_r(self, r2, ti, tj):
        return self._interp(self.g_table, r2)


def tabulate(potential, r_max: float, n: int = 4096, types=(0, 0), dtype=jnp.float32):
    """Sample any radial potential onto a Tabulated one."""
    r2 = jnp.linspace(1e-6, r_max * r_max, n, dtype=dtype)
    ti = jnp.asarray(types[0])
    tj = jnp.asarray(types[1])
    return Tabulated(
        r2_max=jnp.asarray(r_max * r_max, dtype),
        energy_table=potential.energy(r2, ti, tj).astype(dtype),
        g_table=potential.force_div_r(r2, ti, tj).astype(dtype),
        cutoff=jnp.asarray(r_max, dtype),
    )
