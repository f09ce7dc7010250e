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
bottom operator, exact for charge-neutral systems.

Exterior media (reference PoissonSlab/Permitivity): ``eps_top`` /
``eps_bottom`` select dielectric half-spaces above/below (image-charge
physics emerges from the interface BC rows — see _build_poisson_ops) or
grounded metallic walls (math.inf); uniform wall surface charge densities
enter the k = 0 flux row. The reference's tolerance-driven near-field Ewald
split (PoissonSlab/NearField.cuh) is not replicated: accuracy here is set
by the grid resolution (points_per_gw), trading the split's small-gw
economy for a single spectral pass.

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


def _build_poisson_ops(nz, H, kxs, kys, eps, eps_top=None, eps_bottom=None):
    """Per-mode Poisson operators with general z boundaries.

    ``eps_top`` / ``eps_bottom`` are the permittivities of the semi-infinite
    media above/below the slab (reference: DPPoissonSlab.cuh:17 Permitivity
    {inside, top, bottom}); ``math.inf`` = metallic (grounded) wall. The
    exterior decaying solution phi ~ e^{-k|z|} is eliminated through the
    interface conditions (phi continuous, eps phi' continuous):

        eps_in phi' + eps_top    k phi = 0   at z = +H/2
        eps_in phi' - eps_bottom k phi = 0   at z = -H/2

    (uniform eps_top = eps_bottom = eps reduces to the plain decay BCs;
    eps -> inf gives phi = 0, the metallic limit.)
    """
    if eps_top is None:
        eps_top = eps
    if eps_bottom is None:
        eps_bottom = eps
    D = cheb_derivative_matrix(nz, H / 2.0)
    D2 = D @ D
    eye = np.eye(nz)
    kx = np.asarray(kxs).ravel()
    ky = np.asarray(kys).ravel()
    nk = kx.shape[0]
    ops = np.empty((nk, nz, nz))
    metal_top = math.isinf(eps_top)
    metal_bottom = math.isinf(eps_bottom)
    for i in range(nk):
        k2 = kx[i] ** 2 + ky[i] ** 2
        k = math.sqrt(k2)
        A = D2 - k2 * eye
        if metal_top:
            A[0, :] = eye[0]
        elif k2 > 0:
            A[0, :] = eps * D[0] + eps_top * k * eye[0]
        else:
            A[0, :] = D[0]  # k=0: zero exterior field (neutral system)
        if metal_bottom:
            A[nz - 1, :] = eye[nz - 1]
        elif k2 > 0:
            A[nz - 1, :] = eps * D[nz - 1] - eps_bottom * k * eye[nz - 1]
        else:
            A[nz - 1, :] = eye[nz - 1]  # k=0 gauge phi(bottom) = 0
        ops[i] = np.linalg.inv(A)
    return ops


@dataclasses.dataclass(frozen=True)
class DPPoissonSlab:
    """Slab electrostatics with dielectric media / metallic walls outside
    (reference: DPPoissonSlab.cuh:17 + PoissonSlab/Permitivity): eps_top /
    eps_bottom set the exterior permittivities (math.inf = grounded metal),
    sigma_top / sigma_bottom are uniform wall surface charge densities
    (require overall neutrality: sum(q) + (sigma_top + sigma_bottom) *
    Lx * Ly = 0 unless a wall is metallic)."""

    box: Box
    epsilon: float
    gw: float
    shape: tuple
    nz: int
    box_size: tuple
    grid: SlabGrid
    inv_ops: jax.Array  # [nk, nz, nz]
    Dz: jax.Array  # [nz, nz]
    eps_top: float = None
    eps_bottom: float = None
    sigma_top: float = 0.0
    sigma_bottom: float = 0.0

    @staticmethod
    def create(box, epsilon=1.0, gw=1.0, points_per_gw=1.5, nz=None,
               support=10, eps_top=None, eps_bottom=None,
               sigma_top=0.0, sigma_bottom=0.0):
        Ls = [float(s) for s in jax.device_get(box.size)]
        nominal = [max(16, int(L * points_per_gw / gw)) for L in Ls[:2]]
        # xy multiples of 8 keep large-N spreads on the pencil MXU path;
        # scale support with the rounding so the physical truncation
        # radius is preserved (the fcm.FCM.create rule)
        shape = tuple(
            next_fft_size(n0, pencil_safe=support <= 16) for n0 in nominal
        )
        ratio = max(sh / n0 for sh, n0 in zip(shape, nominal))
        support = int(2 * math.ceil(support * ratio / 2.0))
        if nz is None:
            nz = max(24, int(Ls[2] * points_per_gw / gw) + 1)
        kx = 2 * math.pi * np.fft.fftfreq(shape[0], d=Ls[0] / shape[0])
        ky = 2 * math.pi * np.fft.rfftfreq(shape[1], d=Ls[1] / shape[1])
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        ops = _build_poisson_ops(nz, Ls[2], KX, KY, epsilon,
                                 eps_top=eps_top, eps_bottom=eps_bottom)
        sg = SlabGrid(shape=shape, nz=nz, box_size=tuple(Ls), sigma=gw,
                      support=support)
        if sigma_top or sigma_bottom:
            et = epsilon if eps_top is None else eps_top
            eb = epsilon if eps_bottom is None else eps_bottom
            if math.isinf(et) or math.isinf(eb):
                raise ValueError(
                    "prescribed surface charge on a metallic wall is not "
                    "meaningful (the wall charge is induced)"
                )
        return DPPoissonSlab(
            box=box, epsilon=epsilon, gw=gw, shape=shape, nz=nz,
            box_size=tuple(Ls), grid=sg,
            inv_ops=jnp.asarray(ops, jnp.float32),
            Dz=jnp.asarray(cheb_derivative_matrix(nz, Ls[2] / 2.0), jnp.float32),
            eps_top=eps_top, eps_bottom=eps_bottom,
            sigma_top=float(sigma_top), sigma_bottom=float(sigma_bottom),
        )

    def fields(self, pos, charge):
        dtype = pos.dtype
        # one pencil binning serves the spread and the fused interpolation
        ctx = self.grid.pencil_ctx(pos)
        rho = self.grid.spread(pos, charge, ctx=ctx)  # [nx, ny, nz]
        rho_k = jnp.fft.rfftn(rho, axes=(0, 1))  # [nx, nyk, nz]
        nx, nyk = rho_k.shape[0], rho_k.shape[1]
        rhs = -rho_k / self.epsilon
        # BC rows: zero except the k = 0 top flux from wall surface charge
        # (D-field jump with a zero exterior k = 0 field:
        # phi'(top) = sigma_top / eps_in; the bottom flux then follows from
        # global neutrality through the interior equation)
        rhs = rhs.at[..., 0].set(0.0).at[..., self.nz - 1].set(0.0)
        if self.sigma_top or self.sigma_bottom:
            # rfftn convention: the k = 0 coefficient carries a factor
            # nx * ny that irfftn divides back out
            rhs = rhs.at[0, 0, 0].set(
                self.sigma_top / self.epsilon * self.shape[0] * self.shape[1]
            )
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
        out = self.grid.interpolate(
            pos, jnp.concatenate([phi[..., None], E], axis=-1), ctx=ctx
        )
        return out[:, 0], out[:, 1:4]

    def sum(self, pos, charge, computables: Computables = Computables()):
        phi_i, E_i = self.fields(pos, charge)
        force = charge[:, None] * E_i if computables.force else None
        energy = 0.5 * charge * phi_i if computables.energy else None
        return ForceEnergyVirial(force=force, energy=energy)


@dataclasses.dataclass(frozen=True)
class DPPoissonSlabSplit:
    """Ewald-split DP slab Poisson (reference: DoublyPeriodic/PoissonSlab/
    NearField.cuh:14-92): the far field is the BVP solve of *widened*
    Gaussian charges (ngw = sqrt(gw^2 + 1/(4 split^2)) — a much coarser
    xy-grid / Chebyshev rank for small gw), the short-range remainder is
    the same free-space Gaussian-difference kernel as the TP split
    (electrostatics.poisson.GaussianNearField), summed over a cell grid
    whose z axis is padded by the cutoff so the open direction never
    wraps. Wall-image/dielectric responses ride the far field at width
    ngw — particles must keep the usual few-ngw safety margin from the
    boundaries (the reference has the same constraint)."""

    far: DPPoissonSlab
    gw: float
    split: float
    ngw: float
    epsilon: float
    near: object  # poisson.GaussianNearField

    @property
    def rcut(self) -> float:
        return self.near.rcut

    @property
    def fit_error(self) -> float:
        return self.near.fit_error

    @staticmethod
    def create(box, n, epsilon=1.0, gw=1.0, split=1.0, tolerance=1e-4,
               points_per_gw=1.5, nz=None, support=10,
               eps_top=None, eps_bottom=None,
               sigma_top=0.0, sigma_bottom=0.0,
               pos=None, n_strag: int = 0, cap=None):
        from .poisson import GaussianNearField, near_cutoff

        Ls = [float(s) for s in jax.device_get(box.size)]
        ngw = math.sqrt(gw * gw + 1.0 / (4.0 * split * split))
        far = DPPoissonSlab.create(
            box, epsilon=epsilon, gw=ngw, points_per_gw=points_per_gw,
            nz=nz, support=support, eps_top=eps_top, eps_bottom=eps_bottom,
            sigma_top=sigma_top, sigma_bottom=sigma_bottom,
        )
        rcut = min(near_cutoff(ngw, tolerance), 0.45 * min(Ls[:2]))
        near = GaussianNearField.create(
            (Ls[0], Ls[1], Ls[2] + 2.0 * rcut), n,
            gw=gw, ngw=ngw, epsilon=epsilon, rcut=rcut,
            pos=pos, n_strag=n_strag, cap=cap,
        )
        return DPPoissonSlabSplit(far=far, gw=gw, split=split, ngw=ngw,
                                  epsilon=epsilon, near=near)

    def sum(self, pos, charge, computables: Computables = Computables()):
        fev = self.far.sum(pos, charge, computables)
        nf = self.near.apply(pos, charge)
        force = None
        energy = None
        if computables.force:
            force = (fev.force if fev.force is not None else 0.0) + (
                charge[:, None] * nf[:, :3]
            )
        if computables.energy:
            self_e = (0.5 * self.near.self_G) * charge * charge
            energy = (fev.energy if fev.energy is not None else 0.0) + (
                0.5 * charge * nf[:, 3] + self_e
            )
        return ForceEnergyVirial(force=force, energy=energy)
