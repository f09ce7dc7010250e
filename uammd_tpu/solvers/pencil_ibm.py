"""Pencil-decomposed spread/interpolate: the MXU formulation of IBM.

Third-generation spread/interp (after solvers/ibm.py direct scatter and
solvers/tiled_ibm.py 4^3-tile contraction), same math and API convention as
the reference IBM module (reference: src/misc/IBM.cuh:101): S spreads with a
1/dV density factor, J = S* interpolates.

Why another layout: the tiled path's per-tile contraction is a batched
[t^2 x 27cap x tC] matmul with t=4 — M=16, N=12 against a 128x128 MXU, ~1%
utilization, measured 190 ms per spread at N=131k on a 144^3 grid where the
arithmetic is worth ~2 ms.  Here the unit of work is an 8x8 xy *pencil*
spanning the whole z axis:

1. particles are binned by xy-pencil only (324 pencils at 144^3 vs 46656
   tiles) with the two-sort filler algorithm, storing *particle ids* — the
   bins are kernel- and value-independent, so one binning serves spread and
   interpolate (and the torque-kernel passes) in the same spectral step;
2. per-axis weights: x/y over the pencil's (8 + 2 halo)-point patch, z
   *densely* over the whole axis (phi self-truncates, so dense evaluation
   is exact and needs no z-binning);
3. the per-pencil contraction is  patch[(8+2h)^2, nz*C] =
   wxy[(8+2h)^2, cap]^T . (wz*values)[cap, nz*C]  — with cap ~ 500 at
   N=131k this is an M=256, K=512, N=432 matmul per pencil: real MXU work;
4. patches overlap-add into the grid with two roll-and-pad folds (x then
   y); interpolation runs the adjoint contraction over the same bins.

Constraints (else fall back to tiled/direct): shape[0], shape[1] divisible
by 8 and >= 8 + 2*halo; shape[2] >= support; halo = ceil(support/2) <= 8.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp

from ..core.box import Box

PENCIL = 8


def _halo(support: int) -> int:
    return (support + 1) // 2


def pencil_ok(shape, support, slack: int = 0, custom_z: bool = False) -> bool:
    """``custom_z``: caller supplies z_weights (Chebyshev/2D grids), so
    the dense-z min-image constraint shape[2] >= support does not apply."""
    h = _halo(support) + slack
    return (
        h <= PENCIL
        and shape[0] % PENCIL == 0
        and shape[1] % PENCIL == 0
        and shape[0] >= PENCIL + 2 * h
        and shape[1] >= PENCIL + 2 * h
        and (custom_z or shape[2] >= support)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PencilBins:
    """xy-pencil assignment of N particles: ids only, kernel-independent.

    pids: [npencils, cap] int32, 1-based particle ids, 0 = empty slot.
    slot_of_pid: [N] int32, flat slot index of each particle (stale —
        pointing at pencil 0 slot 0 — for particles dropped by a capacity
        overflow; ``overflow`` latches in that case).
    overflow: [] bool.
    """

    pids: jnp.ndarray
    slot_of_pid: jnp.ndarray
    overflow: jnp.ndarray


def default_cap(n, shape) -> int:
    """Pencil capacity: mean load + 6 sigma Poisson + 16, rounded up to a
    multiple of 8 (the MXU-contracted dimension). The flat +16 covers
    *structured* configurations a fluctuation margin cannot: a lattice
    start incommensurate with the pencil grid systematically concentrates
    an extra crystal plane in some pencils (measured: fcc at 131k on a
    144^2 xy grid peaks at 512/pencil vs lam = 404.5 — above the old
    lam + 5 sqrt(lam) + 4 = 510 margin, silently dropping particles from
    the far spread until the melt relaxes the commensuration). Cost is
    linear in cap (~+7% on the far contraction), unlike the near grid's
    CAP^2."""
    npen = (shape[0] // PENCIL) * (shape[1] // PENCIL)
    lam = n / npen
    cap = max(4, int(math.ceil(lam + 6.0 * math.sqrt(lam))) + 16)
    return (cap + 7) // 8 * 8


def bin_pencils(pos, shape, box: Box, *, cap=None) -> PencilBins:
    """Assign particles to xy-pencils (two-sort filler algorithm, id
    columns only — see engine/layout.py for the algorithm discussion)."""
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    n = pos.shape[0]
    if cap is None:
        cap = default_cap(n, shape)
    L = box.size.astype(pos.dtype)
    frac = pos[:, :2] / L[:2] + 0.5
    frac = frac - jnp.floor(frac)
    ix = jnp.minimum((frac[:, 0] * (shape[0] // PENCIL)).astype(jnp.int32),
                     npx - 1)
    iy = jnp.minimum((frac[:, 1] * (shape[1] // PENCIL)).astype(jnp.int32),
                     npy - 1)
    key = ix * npy + iy
    filler = jnp.repeat(jnp.arange(npen, dtype=jnp.int32), cap)
    key2 = jnp.concatenate([key * 2, filler * 2 + 1])
    pid = jnp.concatenate([
        jnp.arange(1, n + 1, dtype=jnp.int32),
        jnp.zeros((npen * cap,), jnp.int32),
    ])
    s_key, s_pid = jax.lax.sort((key2, pid), dimension=0, num_keys=1)
    cell = s_key >> 1
    m = n + npen * cap
    idx = jnp.arange(m, dtype=jnp.int32)
    first = jnp.searchsorted(cell, cell, side="left").astype(jnp.int32)
    rank = idx - first
    kept = rank < cap
    overflow = jnp.any(((s_key & 1) == 0) & (rank >= cap))
    slot = jnp.where(kept, cell * cap + rank, m + idx)
    _, pids_flat = jax.lax.sort((slot, s_pid), dimension=0, num_keys=1)
    pids_flat = pids_flat[: npen * cap]
    slot_of_pid = jnp.zeros((n,), jnp.int32).at[
        jnp.where(pids_flat > 0, pids_flat - 1, n)
    ].set(jnp.arange(npen * cap, dtype=jnp.int32), mode="drop")
    return PencilBins(
        pids=pids_flat.reshape(npen, cap),
        slot_of_pid=slot_of_pid,
        overflow=overflow,
    )


def _node_coords(pos, shape, box: Box):
    """Node-space coordinate u: node g sits at (g + 0.5) h - L/2, so
    u = pos/h + n/2 - 0.5 is the (fractional) node index of each particle."""
    n = jnp.asarray(shape, pos.dtype)
    h = box.size.astype(pos.dtype) / n
    return pos / h[None, :] + 0.5 * n[None, :] - 0.5


def _wrap_nodes(d, n):
    return d - n * jnp.round(d / n)


def _axis_weights(kernel, u_ax, origin, width, n_ax):
    """phi at patch nodes origin + j (j < width) vs coords u_ax [..., 1]."""
    j = jnp.arange(width, dtype=u_ax.dtype)
    d = origin + j - u_ax
    return kernel.phi(_wrap_nodes(d, jnp.asarray(n_ax, u_ax.dtype)))


def _pencil_origins(npx, npy, halo, dtype):
    pen = jnp.arange(npx * npy, dtype=jnp.int32)
    ox = ((pen // npy) * PENCIL - halo).astype(dtype)
    oy = ((pen % npy) * PENCIL - halo).astype(dtype)
    return ox, oy


def _fold(patch, halo, axis_p, axis_j):
    """Overlap-add the patch halos into the +-1 pencil neighbours along one
    axis: [..., np, ..., 8+2halo, ...] -> [..., np, ..., 8, ...]."""
    core = jax.lax.slice_in_dim(patch, halo, halo + PENCIL, axis=axis_j)
    left = jax.lax.slice_in_dim(patch, 0, halo, axis=axis_j)
    right = jax.lax.slice_in_dim(
        patch, halo + PENCIL, halo + PENCIL + halo, axis=axis_j
    )
    pad = [(0, 0)] * patch.ndim
    pad[axis_j] = (PENCIL - halo, 0)
    lp = jnp.pad(left, pad)
    pad[axis_j] = (0, PENCIL - halo)
    rp = jnp.pad(right, pad)
    return core + jnp.roll(lp, -1, axis_p) + jnp.roll(rp, 1, axis_p)


def _chunked(fn, args, npen, chunk):
    """lax.map fn over pencil chunks; args lead with a [npen, ...] axis."""
    if chunk is None or chunk >= npen:
        return fn(args)
    pad_t = (-npen) % chunk
    if pad_t:
        args = tuple(
            jnp.concatenate([a, jnp.zeros((pad_t,) + a.shape[1:], a.dtype)])
            for a in args
        )
    out = jax.lax.map(
        fn, tuple(a.reshape(-1, chunk, *a.shape[1:]) for a in args)
    )
    out = out.reshape(-1, *out.shape[2:])
    return out[:npen] if pad_t else out


def spread_pencil(kernel, pos, values, shape, box: Box, bins: PencilBins,
                  *, chunk=64, slack=0, z_weights=None, density_scale=None):
    """S: values [N] or [N, C] -> field [nx, ny, nz(, C)] over shared bins.

    Returns (field, overflow).  Same 1/dV density normalization as
    solvers.ibm.spread; results match it to summation-order rounding.

    ``slack`` widens the patch halo by that many grid points: weights stay
    exact for particles that drifted up to slack*h in x/y since ``bins``
    was built (z is evaluated densely — z drift never matters), enabling
    persistent bins across integrator steps.  The CALLER owns the rebin
    criterion: max |x,y drift| < slack*h.

    ``z_weights`` ([N, nz]) replaces the kernel's separable z factor with
    caller-provided per-particle weights — the doubly periodic solvers'
    Chebyshev-z Gaussians (DPStokes/DPPoissonSlab) ride the same xy-pencil
    MXU path this way. ``density_scale`` then overrides the default
    1/(hx hy hz) (use 1/(hx hy) when z_weights already carry the z
    normalization)."""
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    C = values.shape[1]
    assert pencil_ok(shape, kernel.support, slack,
                     custom_z=z_weights is not None), (
        f"shape {tuple(shape)} unsuitable for the pencil path with support "
        f"{kernel.support} + slack {slack} — use spread_auto"
    )
    halo = _halo(kernel.support) + slack
    P = PENCIL + 2 * halo
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    nz = shape[2]
    dtype = values.dtype
    h = box.size.astype(dtype) / jnp.asarray(shape, dtype)
    inv_dV = (1.0 / (h[0] * h[1] * h[2]) if density_scale is None
              else jnp.asarray(density_scale, dtype))

    u = _node_coords(pos, shape, box).astype(dtype)
    mask = bins.pids > 0
    src = jnp.maximum(bins.pids - 1, 0)
    pu = u[src]                                            # [npen, cap, 3]
    pv = jnp.where(mask[..., None], values[src], 0)        # [npen, cap, C]
    ox, oy = _pencil_origins(npx, npy, halo, dtype)
    zw = None if z_weights is None else z_weights[src]     # [npen, cap, nz]

    def do(args):
        if z_weights is None:
            pu_c, pv_c, ox_c, oy_c = args
            wz = _axis_weights(kernel, pu_c[:, :, 2:3], 0.0, nz, shape[2])
        else:
            pu_c, pv_c, ox_c, oy_c, wz = args
        wx = _axis_weights(kernel, pu_c[:, :, 0:1], ox_c[:, None, None],
                           P, shape[0])
        wy = _axis_weights(kernel, pu_c[:, :, 1:2], oy_c[:, None, None],
                           P, shape[1])
        wxy = (wx[:, :, :, None] * wy[:, :, None, :]).reshape(
            wx.shape[0], -1, P * P
        )
        q = (wz[:, :, :, None] * pv_c[:, :, None, :]).reshape(
            wz.shape[0], -1, nz * C
        )
        return jnp.einsum("scp,scq->spq", wxy, q,
                          preferred_element_type=dtype)

    args = (pu, pv, ox, oy) if zw is None else (pu, pv, ox, oy, zw)
    patch = _chunked(do, args, npen, chunk)                # [npen, P*P, nz*C]
    # fold with the fused nz*C minor dim: splitting the trailing axis into
    # [.., nz, C(=3)] first makes every fold op pay the degenerate-lane
    # tax (measured round 5 on v5e: 28.9 of the 30.8 ms spread was this
    # fold; same values, same addition order — the reshape to [nz, C]
    # commutes with the x/y folds)
    patch = patch.reshape(npx, npy, P, P, nz * C)
    patch = _fold(patch, halo, axis_p=0, axis_j=2)         # [npx,npy,8,P,..]
    patch = _fold(patch, halo, axis_p=1, axis_j=3)         # [npx,npy,8,8,..]
    field = patch.transpose(0, 2, 1, 3, 4).reshape(
        npx * PENCIL, npy * PENCIL, nz, C
    ) * inv_dV
    return (field[..., 0] if squeeze else field), bins.overflow


def interpolate_pencil(kernel, pos, field, box: Box, bins: PencilBins,
                       *, chunk=64, slack=0, z_weights=None):
    """J = S*: field [nx, ny, nz(, C)] -> [N(, C)] over shared bins.
    ``slack``/``z_weights`` as in spread_pencil (pass quadrature-weighted
    z_weights for Chebyshev-z interpolation)."""
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    C = field.shape[-1]
    shape = field.shape[:3]
    assert pencil_ok(shape, kernel.support, slack,
                     custom_z=z_weights is not None), (
        f"shape {tuple(shape)} unsuitable for the pencil path with support "
        f"{kernel.support} + slack {slack} — use interpolate_auto"
    )
    halo = _halo(kernel.support) + slack
    P = PENCIL + 2 * halo
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    nz = shape[2]
    n = pos.shape[0]
    dtype = field.dtype

    u = _node_coords(pos, shape, box).astype(dtype)
    src = jnp.maximum(bins.pids - 1, 0)
    pu = u[src]                                            # [npen, cap, 3]
    ox, oy = _pencil_origins(npx, npy, halo, dtype)
    zw = None if z_weights is None else z_weights[src]     # [npen, cap, nz]

    # window per pencil: [npx, npy, P, P, nz, C] built from rolls
    # build the window with the fused nz*C minor dim (a [.., nz, C(=3)]
    # layout pays the degenerate-lane tax on every roll/concat — the
    # spread-fold lesson, round 5)
    ft = field.reshape(npx, PENCIL, npy, PENCIL, nz * C).transpose(
        0, 2, 1, 3, 4
    )
    ftx = jnp.concatenate(
        [
            jnp.roll(ft, 1, axis=0)[:, :, PENCIL - halo:],
            ft,
            jnp.roll(ft, -1, axis=0)[:, :, :halo],
        ],
        axis=2,
    )
    win = jnp.concatenate(
        [
            jnp.roll(ftx, 1, axis=1)[:, :, :, PENCIL - halo:],
            ftx,
            jnp.roll(ftx, -1, axis=1)[:, :, :, :halo],
        ],
        axis=3,
    ).reshape(npen, P * P, nz * C)

    def do(args):
        if z_weights is None:
            pu_c, win_c, ox_c, oy_c = args
            wz = _axis_weights(kernel, pu_c[:, :, 2:3], 0.0, nz, shape[2])
        else:
            pu_c, win_c, ox_c, oy_c, wz = args
        wx = _axis_weights(kernel, pu_c[:, :, 0:1], ox_c[:, None, None],
                           P, shape[0])
        wy = _axis_weights(kernel, pu_c[:, :, 1:2], oy_c[:, None, None],
                           P, shape[1])
        wxy = (wx[:, :, :, None] * wy[:, :, None, :]).reshape(
            wx.shape[0], -1, P * P
        )
        a = jnp.einsum("scp,spq->scq", wxy, win_c,
                       preferred_element_type=dtype)
        a = a.reshape(a.shape[0], -1, nz, C)
        return jnp.einsum("scz,sczk->sck", wz, a,
                          preferred_element_type=dtype)

    args = (pu, win, ox, oy) if zw is None else (pu, win, ox, oy, zw)
    v = _chunked(do, args, npen, chunk)                    # [npen, cap, C]
    out = v.reshape(-1, C)[bins.slot_of_pid]
    # particles dropped by an overflow read a stale slot — poisoning is the
    # caller's job via the returned flag (spread_auto/_poison idiom)
    assert out.shape[0] == n
    return (out[:, 0] if squeeze else out), bins.overflow


# ---------------------------------------------------------------- fused path
def _fused_ok(kernel, shape, slack, z_weights, C):
    import jax as _jax

    return (
        z_weights is None
        and C <= 8
        and _jax.default_backend() == "tpu"
        and pencil_ok(shape, kernel.support, slack)
    )


def spread_pencil_fused(kernel, pos, values, shape, box: Box,
                        bins: PencilBins, *, slack=0, density_scale=None,
                        interpret=None):
    """Pallas-fused spread: one program per xy-pencil computes the
    separable weights DIRECTLY in the contraction layouts — wxy at
    [cap, P^2] and q = wz*v at [cap, nz*C] from lane-index decompositions
    (no outer-product reshapes, the relayouts that dominate the XLA path;
    measured round 5: weights+outer+gather ~10 of 13.6 ms per direction)
    — and feeds one [P^2, cap] x [cap, nz*C] MXU contraction. Bitwise
    layout/semantics of spread_pencil (same fold + 1/dV path).
    """
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    C = values.shape[1]
    halo = _halo(kernel.support) + slack
    P = PENCIL + 2 * halo
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    nz = shape[2]
    dtype = values.dtype
    h = box.size.astype(dtype) / jnp.asarray(shape, dtype)
    inv_dV = (1.0 / (h[0] * h[1] * h[2]) if density_scale is None
              else jnp.asarray(density_scale, dtype))
    cap = bins.pids.shape[1]

    u = _node_coords(pos, shape, box).astype(dtype)
    mask = bins.pids > 0
    src = jnp.maximum(bins.pids - 1, 0)
    pu = jnp.transpose(u[src], (0, 2, 1))                  # [npen, 3, cap]
    pv = jnp.where(mask[..., None], values[src], 0)
    pv = jnp.transpose(pv, (0, 2, 1))                      # [npen, C, cap]
    nxf = np.float32(shape[0])
    nyf = np.float32(shape[1])
    nzf = np.float32(shape[2])
    Pf2 = P * P
    NQ = nz * C

    def kern_body(pu_ref, pv_ref, out_ref):
        pid = pl.program_id(0)
        ox = ((pid // npy) * PENCIL - halo).astype(jnp.float32)
        oy = ((pid % npy) * PENCIL - halo).astype(jnp.float32)
        ux = pu_ref[0, 0, :][:, None]                      # [cap, 1]
        uy = pu_ref[0, 1, :][:, None]
        uz = pu_ref[0, 2, :][:, None]
        # wxy [cap, P^2] straight from the lane decomposition
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, Pf2), 1)
        jx = (lane // P).astype(jnp.float32)
        jy = (lane - (lane // P) * P).astype(jnp.float32)
        dx = ox + jx - ux
        dy = oy + jy - uy
        dx = dx - nxf * jnp.round(dx / nxf)
        dy = dy - nyf * jnp.round(dy / nyf)
        wxy = kernel.phi(dx) * kernel.phi(dy)
        # q [cap, nz*C]: z = lane // C, channel = lane % C
        laneq = jax.lax.broadcasted_iota(jnp.int32, (cap, NQ), 1)
        zq = (laneq // C).astype(jnp.float32)
        cq = laneq - (laneq // C) * C
        dz = zq - uz
        dz = dz - nzf * jnp.round(dz / nzf)
        wz = kernel.phi(dz)
        q = jnp.zeros((cap, NQ), jnp.float32)
        for c in range(C):
            vc = pv_ref[0, c, :][:, None]
            q = q + jnp.where(cq == c, wz * vc, 0.0)
        out_ref[0, :, :] = jax.lax.dot_general(
            wxy, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    patch = pl.pallas_call(
        kern_body,
        grid=(npen,),
        in_specs=[
            pl.BlockSpec((1, 3, cap), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, cap), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Pf2, NQ), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npen, Pf2, NQ), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npen * Pf2 * cap * NQ,
            bytes_accessed=npen * (Pf2 * NQ + (3 + C) * cap) * 4,
            transcendentals=npen * cap * (2 * Pf2 + NQ),
        ),
        interpret=interpret,
    )(pu, pv)

    # fold with the fused nz*C minor dim: a [.., nz, C(=3)] layout makes
    # every fold op pay the degenerate-lane tax (measured 28.9 of the
    # 30.8 ms XLA spread; the contraction itself is 3.7 ms)
    patch = patch.reshape(npx, npy, P, P, NQ)
    patch = _fold(patch, halo, axis_p=0, axis_j=2)
    patch = _fold(patch, halo, axis_p=1, axis_j=3)
    field = patch.transpose(0, 2, 1, 3, 4).reshape(
        npx * PENCIL, npy * PENCIL, nz, C
    ) * inv_dV
    return (field[..., 0] if squeeze else field), bins.overflow


def interpolate_pencil_fused(kernel, pos, field, box: Box,
                             bins: PencilBins, *, slack=0,
                             interpret=None):
    """Pallas-fused adjoint of spread_pencil_fused: per pencil, one
    [cap, P^2] x [P^2, nz*C] MXU contraction against the XLA-built window
    followed by the in-register z contraction. Same output convention as
    interpolate_pencil."""
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    C = field.shape[-1]
    shape = field.shape[:3]
    halo = _halo(kernel.support) + slack
    P = PENCIL + 2 * halo
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    nz = shape[2]
    n = pos.shape[0]
    dtype = field.dtype
    cap = bins.pids.shape[1]
    Pf2 = P * P
    NQ = nz * C

    u = _node_coords(pos, shape, box).astype(dtype)
    src = jnp.maximum(bins.pids - 1, 0)
    pu = jnp.transpose(u[src], (0, 2, 1))                  # [npen, 3, cap]

    # build the window with the fused nz*C minor dim (a [.., nz, C(=3)]
    # layout pays the degenerate-lane tax on every roll/concat — the
    # spread-fold lesson, round 5)
    ft = field.reshape(npx, PENCIL, npy, PENCIL, nz * C).transpose(
        0, 2, 1, 3, 4
    )
    ftx = jnp.concatenate(
        [
            jnp.roll(ft, 1, axis=0)[:, :, PENCIL - halo:],
            ft,
            jnp.roll(ft, -1, axis=0)[:, :, :halo],
        ],
        axis=2,
    )
    win = jnp.concatenate(
        [
            jnp.roll(ftx, 1, axis=1)[:, :, :, PENCIL - halo:],
            ftx,
            jnp.roll(ftx, -1, axis=1)[:, :, :, :halo],
        ],
        axis=3,
    ).reshape(npen, Pf2, NQ)

    nxf = np.float32(shape[0])
    nyf = np.float32(shape[1])
    nzf = np.float32(shape[2])

    def kern_body(pu_ref, win_ref, out_ref):
        pid = pl.program_id(0)
        ox = ((pid // npy) * PENCIL - halo).astype(jnp.float32)
        oy = ((pid % npy) * PENCIL - halo).astype(jnp.float32)
        ux = pu_ref[0, 0, :][:, None]
        uy = pu_ref[0, 1, :][:, None]
        uz = pu_ref[0, 2, :][:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, Pf2), 1)
        jx = (lane // P).astype(jnp.float32)
        jy = (lane - (lane // P) * P).astype(jnp.float32)
        dx = ox + jx - ux
        dy = oy + jy - uy
        dx = dx - nxf * jnp.round(dx / nxf)
        dy = dy - nyf * jnp.round(dy / nyf)
        wxy = kernel.phi(dx) * kernel.phi(dy)
        a = jax.lax.dot_general(
            wxy, win_ref[0, :, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [cap, NQ]
        laneq = jax.lax.broadcasted_iota(jnp.int32, (cap, NQ), 1)
        zq = (laneq // C).astype(jnp.float32)
        cq = laneq - (laneq // C) * C
        dz = zq - uz
        dz = dz - nzf * jnp.round(dz / nzf)
        s = kernel.phi(dz) * a
        for c in range(C):
            out_ref[0, c, :] = jnp.sum(
                jnp.where(cq == c, s, 0.0), axis=1
            )

    v = pl.pallas_call(
        kern_body,
        grid=(npen,),
        in_specs=[
            pl.BlockSpec((1, 3, cap), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pf2, NQ), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, cap), lambda p: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npen, C, cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npen * Pf2 * cap * NQ,
            bytes_accessed=npen * (Pf2 * NQ + (3 + C) * cap) * 4,
            transcendentals=npen * cap * (2 * Pf2 + NQ),
        ),
        interpret=interpret,
    )(pu, win)

    out = jnp.transpose(v, (0, 2, 1)).reshape(-1, C)[bins.slot_of_pid]
    assert out.shape[0] == n
    return (out[..., 0] if squeeze else out), bins.overflow
