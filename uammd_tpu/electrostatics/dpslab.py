"""Doubly periodic Poisson: slab electrostatics with open z boundaries.

TPU-native analog of the reference DPPoissonSlab (reference:
src/Interactor/DoublyPeriodic/DPPoissonSlab.cuh:17 and PoissonSlab/
{BVPPoisson,FarField,spreadInterp,FastChebyshevTransform}): Gaussian charges
in a slab, periodic in (x, y), open (vacuum) in z. Per transverse mode the
Poisson BVP

    phi'' - k^2 phi = -rho_k / eps
    phi' = -k phi  at z = +H/2      (decay like e^{-k|z|} outside)
    phi' = +k phi  at z = -H/2

is collocated on Chebyshev points with host-precomputed dense inverses
applied as a batched MXU matmul (see solvers/bvp.py — the reference's
BVPSolver + KBPENTA pipeline). The k = 0 mode uses a Neumann-top/gauge-
bottom operator, exact for charge-neutral systems. The reference's
dielectric-jump and metallic-wall Permitivity options are not yet ported
(uniform permittivity here).

Forces: E = -grad phi (ik in-plane, Chebyshev differentiation in z).
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
from ..solvers.bvp import cheb_derivative_matrix
from ..solvers.slab_grid import SlabGrid


def _build_poisson_ops(nz, H, kxs, kys, eps):
    D = cheb_derivative_matrix(nz, H / 2.0)
    D2 = D @ D
    eye = np.eye(nz)
    kx = np.asarray(kxs).ravel()
    ky = np.asarray(kys).ravel()
    nk = kx.shape[0]
    ops = np.empty((nk, nz, nz))
    for i in range(nk):
        k2 = kx[i] ** 2 + ky[i] ** 2
        k = math.sqrt(k2)
        A = D2 - k2 * eye
        if k2 > 0:
            A[0, :] = D[0] + k * eye[0]  # top: phi' + k phi = 0
            A[nz - 1, :] = D[nz - 1] - k * eye[nz - 1]  # bottom
        else:
            A[0, :] = D[0]  # neutral system: phi'(top) = 0
            A[nz - 1, :] = eye[nz - 1]  # gauge phi(bottom) = 0
        ops[i] = np.linalg.inv(A)
    return ops


@dataclasses.dataclass(frozen=True)
class DPPoissonSlab:
    box: Box
    epsilon: float
    gw: float
    shape: tuple
    nz: int
    box_size: tuple
    grid: SlabGrid
    inv_ops: jax.Array  # [nk, nz, nz]
    Dz: jax.Array  # [nz, nz]

    @staticmethod
    def create(box, epsilon=1.0, gw=1.0, points_per_gw=1.5, nz=None,
               support=10):
        Ls = [float(s) for s in jax.device_get(box.size)]
        shape = tuple(
            next_fft_size(max(16, int(L * points_per_gw / gw)))
            for L in Ls[:2]
        )
        if nz is None:
            nz = max(24, int(Ls[2] * points_per_gw / gw) + 1)
        kx = 2 * math.pi * np.fft.fftfreq(shape[0], d=Ls[0] / shape[0])
        ky = 2 * math.pi * np.fft.rfftfreq(shape[1], d=Ls[1] / shape[1])
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        ops = _build_poisson_ops(nz, Ls[2], KX, KY, epsilon)
        sg = SlabGrid(shape=shape, nz=nz, box_size=tuple(Ls), sigma=gw,
                      support=support)
        return DPPoissonSlab(
            box=box, epsilon=epsilon, gw=gw, shape=shape, nz=nz,
            box_size=tuple(Ls), grid=sg,
            inv_ops=jnp.asarray(ops, jnp.float32),
            Dz=jnp.asarray(cheb_derivative_matrix(nz, Ls[2] / 2.0), jnp.float32),
        )

    def fields(self, pos, charge):
        dtype = pos.dtype
        rho = self.grid.spread(pos, charge)  # [nx, ny, nz]
        rho_k = jnp.fft.rfftn(rho, axes=(0, 1))  # [nx, nyk, nz]
        nx, nyk = rho_k.shape[0], rho_k.shape[1]
        rhs = -rho_k / self.epsilon
        # BC rows carry zeros
        rhs = rhs.at[..., 0].set(0.0).at[..., self.nz - 1].set(0.0)
        inv = self.inv_ops.astype(rhs.real.dtype)
        phi_k = jnp.einsum(
            "kij,kj->ki", inv.reshape(nx * nyk, self.nz, self.nz),
            rhs.reshape(nx * nyk, self.nz),
        ).reshape(nx, nyk, self.nz)
        kx = 2 * math.pi * jnp.fft.fftfreq(
            nx, d=self.box_size[0] / nx
        ).astype(dtype)
        ky = 2 * math.pi * jnp.fft.rfftfreq(
            self.shape[1], d=self.box_size[1] / self.shape[1]
        ).astype(dtype)
        Dz = self.Dz.astype(dtype)
        ex_k = -1j * kx[:, None, None] * phi_k
        ey_k = -1j * ky[None, :, None] * phi_k
        ez_k = -jnp.einsum("ij,xyj->xyi", Dz, phi_k)
        phi = jnp.fft.irfftn(phi_k, s=self.shape, axes=(0, 1))
        E = jnp.stack(
            [
                jnp.fft.irfftn(c, s=self.shape, axes=(0, 1))
                for c in (ex_k, ey_k, ez_k)
            ],
            axis=-1,
        )
        phi_i = self.grid.interpolate(pos, phi)
        E_i = self.grid.interpolate(pos, E)
        return phi_i, E_i

    def sum(self, pos, charge, computables: Computables = Computables()):
        phi_i, E_i = self.fields(pos, charge)
        force = charge[:, None] * E_i if computables.force else None
        energy = 0.5 * charge * phi_i if computables.energy else None
        return ForceEnergyVirial(force=force, energy=energy)
