"""Immersed-boundary spread / interpolate (the NUFFT workhorse).

TPU-native analog of the reference IBM module (reference: src/misc/IBM.cuh:101,
IBM_kernels.cuh): particle -> grid spreading  S: f(x_i) -> sum_i f_i phi(x-x_i)
and its adjoint interpolation  J = S*: u(x_i) = sum_g u(g) phi(g-x_i) dV,
with pluggable window kernels:

- Peskin 3-point / 4-point (IBM_kernels.cuh:118,140)
- truncated Gaussian (IBM_kernels.cuh Gaussian)
- Barnett-Magland exp-of-semicircle "ES/BM" (IBM_kernels.cuh:91)

Every spectral module (Poisson, FCM, PSE far field, ICM, DPStokes) builds on
these two operations. The v1 implementation uses one static python loop over
the support^3 offsets with scatter-add / gather — correct everywhere; the
Pallas fused version (grid-resident, like engine/) comes behind the same API.

Convention: grid nodes at cell centers, node g at position
(g + 0.5)/n * L - L/2; phi arguments are in units of grid spacing h
(Peskin kernels are defined on the h-lattice), and spreading carries a 1/h^3
factor so that J S ~ delta (S has units of density).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box


# ------------------------------------------------------------------ kernels
@dataclasses.dataclass(frozen=True)
class Peskin3pt:
    """Peskin 3-point kernel (reference: IBM_kernels.cuh:118)."""

    support: int = 3

    def phi(self, r):
        a = jnp.abs(r)
        in1 = a <= 0.5
        in2 = (a > 0.5) & (a < 1.5)
        p1 = (1.0 + jnp.sqrt(jnp.maximum(1.0 - 3.0 * r * r, 0.0))) / 3.0
        t = -2.0 + 6.0 * a - 3.0 * r * r
        p2 = (5.0 - 3.0 * a - jnp.sqrt(jnp.maximum(t, 0.0))) / 6.0
        return jnp.where(in1, p1, jnp.where(in2, p2, 0.0))


@dataclasses.dataclass(frozen=True)
class Peskin4pt:
    """Peskin 4-point kernel (reference: IBM_kernels.cuh:140)."""

    support: int = 4

    def phi(self, r):
        a = jnp.abs(r)
        in1 = a <= 1.0
        in2 = (a > 1.0) & (a < 2.0)
        p1 = (3.0 - 2.0 * a + jnp.sqrt(jnp.maximum(1.0 + 4.0 * a - 4.0 * a * a, 0.0))) / 8.0
        p2 = (5.0 - 2.0 * a - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * a - 4.0 * a * a, 0.0))) / 8.0
        return jnp.where(in1, p1, jnp.where(in2, p2, 0.0))


@dataclasses.dataclass(frozen=True)
class GaussianKernel:
    """Truncated Gaussian, width sigma in units of h."""

    sigma: float
    support: int = 6

    def phi(self, r):
        cutoff = self.support / 2.0
        w = jnp.exp(-0.5 * (r / self.sigma) ** 2) / (
            self.sigma * math.sqrt(2.0 * math.pi)
        )
        return jnp.where(jnp.abs(r) < cutoff, w, 0.0)


@dataclasses.dataclass(frozen=True)
class BMKernel:
    """Barnett-Magland exp-of-semicircle kernel (reference:
    IBM_kernels.cuh:91): phi(r) = exp[beta (sqrt(1-(2r/w)^2) - 1)] / w."""

    beta: float
    support: int = 6

    def phi(self, r):
        w = float(self.support)
        x = 2.0 * r / w
        inside = jnp.abs(x) < 1.0
        xs = jnp.where(inside, x, 0.0)
        val = jnp.exp(self.beta * (jnp.sqrt(1.0 - xs * xs) - 1.0))
        # normalize numerically to unit sum (quadrature on the h-lattice)
        return jnp.where(inside, val, 0.0)


# ------------------------------------------------------------- spread/interp
def _base_and_fracs(pos, box: Box, shape, support):
    """Nearest-node base index and per-axis offsets/weights."""
    n = jnp.asarray(shape)
    L = box.size.astype(pos.dtype)
    h = L / n
    # grid node g sits at (g + 0.5) h - L/2
    u = pos / h[None, :] + 0.5 * n - 0.5  # node-space coordinate
    if support % 2 == 0:
        base = jnp.floor(u).astype(jnp.int32) - (support // 2 - 1)
    else:
        base = jnp.round(u).astype(jnp.int32) - (support // 2)
    return base, u, h


def _weights_and_indices(kernel, pos, box, shape):
    """All support^3 node indices [N, s^3, 3] and weights [N, s^3]."""
    s = kernel.support
    base, u, h = _base_and_fracs(pos, box, shape, s)
    off = jnp.arange(s)
    # per-axis weights [N, s] and node indices
    w_ax = []
    g_ax = []
    for d in range(3):
        r = base[:, d, None] + off[None, :] - u[:, d, None]
        w_ax.append(kernel.phi(r.astype(pos.dtype)))
        g_ax.append(jnp.mod(base[:, d, None] + off[None, :], shape[d]))
    w = (
        w_ax[0][:, :, None, None]
        * w_ax[1][:, None, :, None]
        * w_ax[2][:, None, None, :]
    ).reshape(pos.shape[0], s**3)
    gx = jnp.broadcast_to(g_ax[0][:, :, None, None], (pos.shape[0], s, s, s))
    gy = jnp.broadcast_to(g_ax[1][:, None, :, None], (pos.shape[0], s, s, s))
    gz = jnp.broadcast_to(g_ax[2][:, None, None, :], (pos.shape[0], s, s, s))
    idx = jnp.stack(
        [gx.reshape(-1, s**3), gy.reshape(-1, s**3), gz.reshape(-1, s**3)], -1
    )
    return idx, w, h


def spread(kernel, pos, values, shape, box: Box):
    """S: values [N] or [N, C] -> field [nx, ny, nz] or [nx, ny, nz, C].

    Carries the 1/h^3 density normalization (so that sum(field)*dV =
    sum(values) when the kernel sums to 1 on the lattice).
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    idx, w, h = _weights_and_indices(kernel, pos, box, shape)
    inv_dV = 1.0 / jnp.prod(h)
    field = jnp.zeros(tuple(shape) + (values.shape[1],), values.dtype)
    contrib = (w * inv_dV)[:, :, None] * values[:, None, :]
    field = field.at[idx[..., 0], idx[..., 1], idx[..., 2]].add(contrib)
    return field[..., 0] if squeeze else field


def interpolate(kernel, pos, field, box: Box):
    """J = S^*: field [nx,ny,nz(,C)] -> per-particle values [N(,C)].

    J u(x_i) = sum_g u_g phi(g - x_i): with sum_g phi = 1 this is the
    interpolation average, and J is the adjoint of S under the weighted
    inner products: <S q, u> dV = <q, J u> (S carries the 1/dV density
    factor; J carries none).
    """
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    idx, w, h = _weights_and_indices(kernel, pos, box, field.shape[:3])
    vals = field[idx[..., 0], idx[..., 1], idx[..., 2]]  # [N, s^3, C]
    out = jnp.sum(w[:, :, None] * vals, axis=1)
    return out[:, 0] if squeeze else out


def _poison(x, overflow):
    """NaN-poison on tile-bin overflow: a dropped contribution is silent
    wrong physics; a NaN trips every downstream check loudly (the engine's
    latched-flag idiom, adapted for callers that only take the array)."""
    return x * jnp.where(overflow, jnp.asarray(jnp.nan, x.dtype),
                         jnp.asarray(1.0, x.dtype))


def spread_auto(kernel, pos, values, shape, box: Box, *, threshold=4096,
                cap=None):
    """Dispatch: pencil MXU path for large N on pencil-safe grids (see
    pencil_ibm.py), tiled scatter-free path when only tile-safe, direct
    scatter otherwise.  A bin-capacity overflow NaN-poisons the result
    rather than silently dropping particles; pass ``cap`` (in units of the
    chosen path's bin) for unusually clustered densities."""
    from .pencil_ibm import bin_pencils, pencil_ok, spread_pencil
    from .tiled_ibm import pick_tile, spread_tiled, tile_shape_ok

    if pos.shape[0] >= threshold:
        if pencil_ok(shape, kernel.support):
            bins = bin_pencils(pos, shape, box, cap=cap)
            field, overflow = spread_pencil(kernel, pos, values, shape, box,
                                            bins)
            return _poison(field, overflow)
        tile = pick_tile(shape, kernel.support)
        if tile_shape_ok(shape, kernel.support, tile):
            field, overflow = spread_tiled(kernel, pos, values, shape, box,
                                           cap=cap, tile=tile)
            return _poison(field, overflow)
    return spread(kernel, pos, values, shape, box)


def interpolate_auto(kernel, pos, field, box: Box, *, threshold=4096,
                     cap=None):
    from .pencil_ibm import bin_pencils, interpolate_pencil, pencil_ok
    from .tiled_ibm import interpolate_tiled, pick_tile, tile_shape_ok

    shape = field.shape[:3]
    if pos.shape[0] >= threshold:
        if pencil_ok(shape, kernel.support):
            bins = bin_pencils(pos, shape, box, cap=cap)
            out, overflow = interpolate_pencil(kernel, pos, field, box, bins)
            return _poison(out, overflow)
        tile = pick_tile(shape, kernel.support)
        if tile_shape_ok(shape, kernel.support, tile):
            out, overflow = interpolate_tiled(kernel, pos, field, box,
                                              cap=cap, tile=tile)
            return _poison(out, overflow)
    return interpolate(kernel, pos, field, box)
