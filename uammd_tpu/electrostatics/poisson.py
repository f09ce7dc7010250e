"""Triply periodic spectral Poisson electrostatics.

TPU-native analog of the reference spectral Ewald Poisson interactor
(reference: src/Interactor/SpectralEwaldPoisson.cuh:1-81): point charges are
spread onto a grid with a Gaussian envelope of width ``gw``, the periodic
Poisson equation is solved in Fourier space,

    phi(k) = rho(k) / (epsilon k^2),    phi(0) = 0   (tinfoil boundary)

the field E = -grad phi is obtained by ik multiplication, and forces
F_i = q_i E(x_i) (and energies 0.5 q_i phi(x_i)) are interpolated back. With
Gaussian spreading applied on both ends the effective pair potential is
erf(r / (2 gw)) / (4 pi eps r) — i.e. charges are physically Gaussian clouds
of width gw, exactly the reference's model (SpectralEwaldPoisson.cuh:22-30).
The reference's split (near-field Ewald) mode is a performance option; the
spectral path here is the full solver (its "no-split direct mode").
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from ..core.grid import next_fft_size
from ..core.types import Computables, ForceEnergyVirial
from ..solvers.ibm import (GaussianKernel, interpolate_auto as interpolate, spread_auto as spread)


@dataclasses.dataclass(frozen=True)
class Poisson:
    box: Box
    epsilon: float = 1.0  # permittivity
    gw: float = 1.0  # Gaussian charge width
    shape: tuple = ()
    support: int = 12
    box_size: tuple = ()

    @staticmethod
    def create(box: Box, epsilon=1.0, gw=1.0, tolerance=1e-4, support=None,
               prefer_pow2=False):
        """Grid sized so h <= gw (reference picks h from tolerance;
        h ~ gw resolves the Gaussian to ~1e-4)."""
        Ls = [float(s) for s in jax.device_get(box.size)]
        h_target = gw / max(1.0, (math.log10(1.0 / tolerance) / 3.0))
        shape = tuple(
            next_fft_size(max(8, int(math.ceil(L / h_target))), prefer_pow2)
            for L in Ls
        )
        if support is None:
            support = min(14, int(2 * math.ceil(3.0 * gw / (Ls[0] / shape[0]))) + 2)
        return Poisson(box=box, epsilon=epsilon, gw=gw, shape=shape,
                       support=support, box_size=tuple(Ls))

    def _kernel(self):
        h = self.box_size[0] / self.shape[0]
        return GaussianKernel(sigma=self.gw / h, support=self.support)

    def fields(self, pos, charge):
        """Return (phi_i, E_i): potential and field at particle positions."""
        kern = self._kernel()
        rho = spread(kern, pos, charge, self.shape, self.box)
        rho_k = jnp.fft.rfftn(rho)
        Ls = self.box_size
        ks = [
            2.0 * math.pi * jnp.fft.fftfreq(n, d=float(L) / n).astype(pos.dtype)
            for n, L in zip(self.shape[:2], Ls[:2])
        ]
        kz = 2.0 * math.pi * jnp.fft.rfftfreq(
            self.shape[2], d=float(Ls[2]) / self.shape[2]
        ).astype(pos.dtype)
        kx, ky, kz = jnp.meshgrid(ks[0], ks[1], kz, indexing="ij")
        k2 = kx * kx + ky * ky + kz * kz
        k2s = jnp.where(k2 > 0, k2, 1.0)
        phi_k = jnp.where(k2 > 0, rho_k / (self.epsilon * k2s), 0.0)
        phi = jnp.fft.irfftn(phi_k, s=self.shape)
        e_k = jnp.stack([-1j * kx * phi_k, -1j * ky * phi_k, -1j * kz * phi_k], -1)
        E = jnp.fft.irfftn(e_k, s=self.shape, axes=(0, 1, 2))
        phi_i = interpolate(kern, pos, phi, self.box)
        E_i = interpolate(kern, pos, E, self.box)
        return phi_i, E_i

    def sum(
        self,
        pos,
        charge,
        computables: Computables = Computables(),
    ) -> ForceEnergyVirial:
        phi_i, E_i = self.fields(pos, charge)
        force = charge[:, None] * E_i if computables.force else None
        energy = 0.5 * charge * phi_i if computables.energy else None
        return ForceEnergyVirial(force=force, energy=energy)


def pair_potential_theory(r, gw, epsilon=1.0):
    """erf(r/(2 gw)) / (4 pi eps r): the exact interaction of two Gaussian
    charges of width gw (for validation against the spectral solver;
    reference documents the same closed form, SpectralEwaldPoisson.cuh:25)."""
    import jax.scipy.special as jsp

    return jsp.erf(r / (2.0 * gw)) / (4.0 * math.pi * epsilon * r)
