"""Shared slab-geometry spreading: Gaussian in (x, y), dense Chebyshev in z.

Used by the doubly periodic solvers (DPStokes, DPPoissonSlab — reference:
src/Integrator/BDHI/DoublyPeriodic/StokesSlab/spreadInterp and
src/Interactor/DoublyPeriodic/PoissonSlab/spreadInterp). The z direction is
resolved on Chebyshev-Lobatto points; for nz <= ~64 the kernel is evaluated
densely at every z node (one [N, nz] outer product) with Clenshaw-Curtis
weights making interpolation the exact adjoint — replacing the reference's
non-uniform z-support bookkeeping with two MXU-friendly contractions.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .chebyshev import clenshaw_curtis_weights, lobatto_points


@dataclasses.dataclass(frozen=True)
class SlabGrid:
    shape: tuple  # (nx, ny)
    nz: int
    box_size: tuple  # (Lx, Ly, H)
    sigma: float  # Gaussian width (same in xy and z)
    support: int = 10

    def _xy(self, pos, dtype):
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
        wx = jnp.exp(
            -0.5 * (((base[:, 0, None] + off - u[:, 0, None]) * hx) / sig) ** 2
        )
        wy = jnp.exp(
            -0.5 * (((base[:, 1, None] + off - u[:, 1, None]) * hy) / sig) ** 2
        )
        gx = jnp.mod(base[:, 0, None] + off, nx)
        gy = jnp.mod(base[:, 1, None] + off, ny)
        norm = 1.0 / (2.0 * math.pi * sig * sig)
        return gx, gy, norm * wx[:, :, None] * wy[:, None, :]

    def _z(self, pos, dtype):
        z = jnp.asarray(lobatto_points(self.nz, self.box_size[2] / 2.0), dtype)
        w = jnp.asarray(
            clenshaw_curtis_weights(self.nz, self.box_size[2] / 2.0), dtype
        )
        sig = self.sigma
        phi = jnp.exp(-0.5 * ((pos[:, 2:3] - z[None, :]) / sig) ** 2) / (
            sig * math.sqrt(2.0 * math.pi)
        )
        return phi, w

    def pencil_ctx(self, pos):
        """(kern, bins, box) for the xy-pencil MXU path (solvers/pencil_ibm
        with Chebyshev z_weights) at large N on pencil-safe square-cell
        grids, else None.  Exact up to the xy-Gaussian truncation at
        support/2 points (the direct scatter does not truncate)."""
        from ..core.box import box as make_box
        from .ibm import GaussianKernel
        from .pencil_ibm import bin_pencils, pencil_ok

        nx, ny = self.shape
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        if (
            pos.shape[0] < 4096
            or abs(hx - hy) > 1e-9 * hx
            or not pencil_ok((nx, ny, self.nz), self.support)
        ):
            return None
        kern = GaussianKernel(sigma=self.sigma / hx, support=self.support)
        b = make_box(list(self.box_size), dtype=pos.dtype)
        return kern, bin_pencils(pos, (nx, ny, self.nz), b), b

    def spread(self, pos, values, ctx=None):
        """values [N, C] -> density field [nx, ny, nz, C]."""
        squeeze = values.ndim == 1
        if squeeze:
            values = values[:, None]
        dtype = values.dtype
        nx, ny = self.shape
        if ctx is None:
            ctx = self.pencil_ctx(pos)
        if ctx:  # ctx=False forces the direct scatter path
            from .ibm import _poison
            from .pencil_ibm import spread_pencil

            kern, bins, b = ctx
            phi_z, _ = self._z(pos, dtype)
            hx = self.box_size[0] / nx
            hy = self.box_size[1] / ny
            field, ovf = spread_pencil(
                kern, pos, values, (nx, ny, self.nz), b, bins,
                z_weights=phi_z, density_scale=1.0 / (hx * hy),
            )
            field = _poison(field, ovf)
            return field[..., 0] if squeeze else field
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        gx, gy, w_xy = self._xy(pos, dtype)
        phi_z, _ = self._z(pos, dtype)
        contrib = (
            w_xy[..., None, None]
            * phi_z[:, None, None, :, None]
            * values[:, None, None, None, :]
        )
        s = self.support
        n = pos.shape[0]
        ix = jnp.broadcast_to(gx[:, :, None], (n, s, s)).reshape(-1)
        iy = jnp.broadcast_to(gy[:, None, :], (n, s, s)).reshape(-1)
        field = jnp.zeros((nx, ny, self.nz, values.shape[1]), dtype)
        field = field.at[ix, iy].add(contrib.reshape(-1, self.nz, values.shape[1]))
        out = field
        return out[..., 0] if squeeze else out

    def interpolate(self, pos, field, ctx=None):
        squeeze = field.ndim == 3
        if squeeze:
            field = field[..., None]
        dtype = field.dtype
        nx, ny = self.shape
        if ctx is None:
            ctx = self.pencil_ctx(pos)
        if ctx:  # ctx=False forces the direct gather path
            from .ibm import _poison
            from .pencil_ibm import interpolate_pencil

            kern, bins, b = ctx
            phi_z, w_cc = self._z(pos, dtype)
            out, ovf = interpolate_pencil(
                kern, pos, field, b, bins,
                z_weights=phi_z * w_cc[None, :],
            )
            out = _poison(out, ovf)
            return out[:, 0] if squeeze else out
        hx = self.box_size[0] / nx
        hy = self.box_size[1] / ny
        gx, gy, w_xy = self._xy(pos, dtype)
        phi_z, w_cc = self._z(pos, dtype)
        s = self.support
        n = pos.shape[0]
        vals = field[
            jnp.broadcast_to(gx[:, :, None], (n, s, s)),
            jnp.broadcast_to(gy[:, None, :], (n, s, s)),
        ]  # [N, s, s, nz, C]
        zquad = phi_z * w_cc[None, :]
        out = jnp.einsum("nab,nz,nabzc->nc", w_xy * hx * hy, zquad, vals)
        return out[:, 0] if squeeze else out
