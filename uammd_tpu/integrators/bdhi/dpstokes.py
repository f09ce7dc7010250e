"""Doubly periodic Stokes: FFT(x,y) x Chebyshev(z) slab solver.

TPU-native analog of the reference DPStokes (reference:
src/Integrator/BDHI/DoublyPeriodic/DPStokesSlab.cuh:141,424 and
StokesSlab/{BVPStokes,FastChebyshevTransform,spreadInterp}): Stokes flow in
a slab, periodic in x and y, with no-slip walls at z = +-H/2 (the
reference's "slit channel" mode; bottom-wall/open modes are corrections on
top of the same machinery).

Per transverse mode (kx, ky), the coupled system

    eta (D^2 - k^2) u - i kx p = -fx         u=v=w=0 at the walls
    eta (D^2 - k^2) v - i ky p = -fy
    eta (D^2 - k^2) w -    D p = -fz
    i kx u + i ky v + D w      = 0

is collocated on nz Chebyshev-Lobatto points into one dense [4nz, 4nz]
complex operator whose inverse is precomputed on the host (the reference
precomputes with LAPACKE, BVPSolver.cuh:217; here the per-step apply is one
batched complex einsum on the MXU — no pentadiagonal recursions).

Spreading: Gaussian in (x, y); in z the kernel is evaluated *densely* at all
Lobatto points (nz <= 64), with Clenshaw-Curtis weights making interpolation
the exact adjoint — the natural TPU replacement for the reference's
non-uniform z-support bookkeeping.

The Brownian path (DPStokesIntegrator, DPStokesSlab.cuh:424) uses the
Lanczos sqrt of this mobility, as in the reference.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...core.grid import next_fft_size
from ...solvers.bvp import cheb_derivative_matrix
from ...solvers.chebyshev import clenshaw_curtis_weights, lobatto_points
from ...solvers.lanczos import lanczos_sqrt_apply


def _build_stokes_ops(nz, H, kxs, kys, viscosity):
    """Host precompute: [nk, 4nz, 4nz] complex inverses."""
    D = cheb_derivative_matrix(nz, H / 2.0)
    D2 = D @ D
    eye = np.eye(nz)
    kx = np.asarray(kxs).ravel()
    ky = np.asarray(kys).ravel()
    nk = kx.shape[0]
    ops = np.empty((nk, 4 * nz, 4 * nz), np.complex128)
    for i in range(nk):
        k2 = kx[i] ** 2 + ky[i] ** 2
        A = np.zeros((4 * nz, 4 * nz), np.complex128)
        L = viscosity * (D2 - k2 * eye)
        sl = [slice(0, nz), slice(nz, 2 * nz), slice(2 * nz, 3 * nz),
              slice(3 * nz, 4 * nz)]
        A[sl[0], sl[0]] = L
        A[sl[0], sl[3]] = -1j * kx[i] * eye
        A[sl[1], sl[1]] = L
        A[sl[1], sl[3]] = -1j * ky[i] * eye
        A[sl[2], sl[2]] = L
        A[sl[2], sl[3]] = -D
        A[sl[3], sl[0]] = 1j * kx[i] * eye
        A[sl[3], sl[1]] = 1j * ky[i] * eye
        A[sl[3], sl[2]] = D
        # no-slip BCs replace the wall rows of each velocity block
        for b in range(3):
            A[sl[b]][0, :] = 0.0  # placeholder; set below properly
        for b in range(3):
            r0 = b * nz
            A[r0, :] = 0.0
            A[r0, r0] = 1.0
            A[r0 + nz - 1, :] = 0.0
            A[r0 + nz - 1, r0 + nz - 1] = 1.0
        if k2 == 0:
            # pressure gauge: fix p at the bottom wall
            A[4 * nz - 1, :] = 0.0
            A[4 * nz - 1, 4 * nz - 1] = 1.0
        ops[i] = np.linalg.inv(A)
    return ops


@dataclasses.dataclass(frozen=True)
class DPStokes:
    box: Box  # box.size[2] = slab height H (z in [-H/2, H/2])
    viscosity: float
    radius: float
    shape: tuple  # (nx, ny) Fourier modes
    nz: int
    box_size: tuple
    support: int
    inv_ops: jax.Array  # [nk, 4nz, 4nz] complex64

    @staticmethod
    def create(box, viscosity=1.0, radius=1.0, points_per_radius=2.0,
               nz=None, support=10):
        Ls = [float(s) for s in jax.device_get(box.size)]
        shape = tuple(
            next_fft_size(max(16, int(L * points_per_radius / radius)))
            for L in Ls[:2]
        )
        if nz is None:
            nz = max(16, int(Ls[2] * points_per_radius / radius) + 1)
        kx = 2 * math.pi * np.fft.fftfreq(shape[0], d=Ls[0] / shape[0])
        ky = 2 * math.pi * np.fft.rfftfreq(shape[1], d=Ls[1] / shape[1])
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        ops = _build_stokes_ops(nz, Ls[2], KX, KY, viscosity)
        return DPStokes(
            box=box, viscosity=viscosity, radius=radius, shape=shape, nz=nz,
            box_size=tuple(Ls), support=support,
            inv_ops=jnp.asarray(ops, jnp.complex64),
        )

    @property
    def sigma(self):
        return self.radius / math.sqrt(math.pi)

    def _zw(self, dtype):
        z = lobatto_points(self.nz, self.box_size[2] / 2.0)
        w = clenshaw_curtis_weights(self.nz, self.box_size[2] / 2.0)
        return jnp.asarray(z, dtype), jnp.asarray(w, dtype)

    def _xy_weights(self, pos, dtype):
        nx, ny = self.shape
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        s = self.support
        u = jnp.stack(
            [pos[:, 0] / hx + 0.5 * nx - 0.5, pos[:, 1] / hy + 0.5 * ny - 0.5],
            -1,
        )
        base = jnp.round(u).astype(jnp.int32) - s // 2
        off = jnp.arange(s)
        sig = self.sigma
        wx = jnp.exp(-0.5 * (((base[:, 0, None] + off - u[:, 0, None]) * hx) / sig) ** 2)
        wy = jnp.exp(-0.5 * (((base[:, 1, None] + off - u[:, 1, None]) * hy) / sig) ** 2)
        gx = jnp.mod(base[:, 0, None] + off, nx)
        gy = jnp.mod(base[:, 1, None] + off, ny)
        norm = hx * hy / (2.0 * math.pi * sig * sig)
        return gx, gy, wx, wy, norm

    def _z_weights(self, pos, dtype):
        z, w = self._zw(dtype)
        sig = self.sigma
        phi = jnp.exp(-0.5 * ((pos[:, 2:3] - z[None, :]) / sig) ** 2) / (
            sig * math.sqrt(2.0 * math.pi)
        )
        return phi, w  # [N, nz], [nz]

    def spread(self, pos, forces):
        """-> f_grid [nx, ny, nz, 3] (force density)."""
        dtype = forces.dtype
        nx, ny = self.shape
        gx, gy, wx, wy, norm = self._xy_weights(pos, dtype)
        phi_z, _ = self._z_weights(pos, dtype)
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        # [N, s, s, nz] weights -> density via / (hx hy) and z handled by phi
        w_xy = norm * wx[:, :, None] * wy[:, None, :] / (hx * hy)
        contrib = (
            w_xy[..., None, None] * phi_z[:, None, None, :, None]
            * forces[:, None, None, None, :]
        )
        field = jnp.zeros((nx, ny, self.nz, 3), dtype)
        s = self.support
        ix = jnp.broadcast_to(gx[:, :, None], (pos.shape[0], s, s)).reshape(-1)
        iy = jnp.broadcast_to(gy[:, None, :], (pos.shape[0], s, s)).reshape(-1)
        field = field.at[ix, iy].add(contrib.reshape(-1, self.nz, 3))
        return field

    def interpolate(self, pos, field):
        dtype = field.dtype
        gx, gy, wx, wy, norm = self._xy_weights(pos, dtype)
        phi_z, w_cc = self._z_weights(pos, dtype)
        s = self.support
        vals = field[
            jnp.broadcast_to(gx[:, :, None], (pos.shape[0], s, s)),
            jnp.broadcast_to(gy[:, None, :], (pos.shape[0], s, s)),
        ]  # [N, s, s, nz, 3]
        w_xy = norm * wx[:, :, None] * wy[:, None, :]
        zquad = phi_z * w_cc[None, :]  # [N, nz]
        return jnp.einsum("nab,nz,nabzc->nc", w_xy, zquad, vals)

    def solve_grid(self, f_grid):
        """f_grid [nx,ny,nz,3] -> velocity grid [nx,ny,nz,3]."""
        fk = jnp.fft.rfftn(f_grid, axes=(0, 1))  # [nx, nyk, nz, 3]
        nx, nyk = fk.shape[0], fk.shape[1]
        rhs = jnp.concatenate(
            [-fk[..., 0], -fk[..., 1], -fk[..., 2],
             jnp.zeros_like(fk[..., 0])],
            axis=-1,
        )  # [nx, nyk, 4nz]
        # wall rows carry the BC values (zero) and k=0 gauge (zero)
        nz = self.nz
        for b in range(3):
            rhs = rhs.at[..., b * nz].set(0.0).at[..., b * nz + nz - 1].set(0.0)
        rhs = rhs.reshape(nx * nyk, 4 * nz)
        sol = jnp.einsum("kij,kj->ki", self.inv_ops, rhs)
        sol = sol.reshape(nx, nyk, 4 * nz)
        uk = jnp.stack(
            [sol[..., 0:nz], sol[..., nz:2 * nz], sol[..., 2 * nz:3 * nz]],
            axis=-1,
        )
        return jnp.fft.irfftn(uk, s=self.shape, axes=(0, 1))

    def compute_mf(self, pos, forces):
        return self.interpolate(pos, self.solve_grid(self.spread(pos, forces)))

    def compute_bdw(self, pos, key, iterations: int = 24):
        def mv(x):
            return self.compute_mf(pos, x.reshape(-1, 3)).reshape(-1)

        z = jax.random.normal(key, (pos.shape[0] * 3,), pos.dtype)
        out, _ = lanczos_sqrt_apply(mv, z, m=iterations)
        return out.reshape(-1, 3)

    def divergence(self, pos):
        return jnp.zeros_like(pos)
