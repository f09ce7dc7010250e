"""Tiled, scatter-free spread/interpolate for large particle counts.

Same API and math as solvers/ibm.py (the reference IBM module,
src/misc/IBM.cuh), but reorganized for the TPU memory system: XLA scatters
run at ~1 GB/s on this platform, so the naive one-big-scatter spread costs
seconds at N ~ 1e5 on fine grids. Here:

1. particles are binned into TILE^3-point grid *tiles* by the same two-sort
   filler algorithm as the MD engine (engine/layout._bin_columns idea) —
   no scatters, empty slots carry a far-away sentinel position so their
   kernel weights vanish identically (no masks);
2. each tile *pulls* sources from its 27 tile neighborhood (jnp.roll over
   tile axes — regular memory movement), evaluates the separable kernel
   weights for its TILE points per axis, and accumulates its TILE^3 patch
   with one batched contraction (MXU matmuls), chunked over tiles;
3. interpolation is the adjoint: each tile gathers its (3*TILE)^3-point
   halo window of the field (27 rolls) and contracts it with its own
   particles' separable weights, axis by axis.

Correctness requirement: ceil(support/2) <= TILE, so a particle's stencil
never extends beyond the neighboring tile. The DEFAULT tile is therefore 4
for support <= 8 kernels (the PSE/FCM Gaussians) and 8 for wider ones: the
27-neighborhood volume a tile pulls is (3*TILE)^3, so halving the tile cuts
the per-point candidate volume 8x (24^3 -> 12^3 around each target point)
at the cost of a relatively larger empty-slot padding fraction in each bin
— measured on v5e, tile 4 is ~2.5-3x faster end-to-end at 128k/150^3.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box

TILE = 8  # maximum supported tile (kernels up to support 16)
EMPTY = 1.0e9


def _tile_counts(shape, tile):
    return tuple((s + tile - 1) // tile for s in shape)


def pick_tile(shape, support) -> int:
    """Smallest legal tile for this (shape, support): 4 when the kernel
    half-support fits and the shape allows it, else 8."""
    for t in (4, 8):
        if (support + 1) // 2 <= t and tile_shape_ok(shape, support, t):
            return t
    return TILE


def tile_shape_ok(shape, support, tile=TILE) -> bool:
    """True iff the 27-tile pull neighborhood reaches every wrap image.

    When an axis is not a multiple of ``tile``, the trailing tile is partial
    (w = shape % tile real points).  A particle at the end of tile nt-2
    reaches wrapped points up to index ceil(support/2) - 1 past the domain
    end; those land in tile 0, which is NOT in tile nt-2's roll
    neighborhood, silently dropping the contribution.  Safe iff the partial
    tile is wide enough to absorb the reach: w == 0 or w >= ceil(support/2)
    per axis (and nt >= 3 so the 27 rolls are distinct tiles).
    """
    half = (support + 1) // 2
    if half > tile:
        return False
    for s in shape:
        w = s % tile
        if w != 0 and w < half:
            return False
    return min(_tile_counts(shape, tile)) >= 3


def _default_cap(n, shape, tile):
    """Bin capacity: mean occupancy + ~5 sigma Poisson margin + slack.
    (The old 2*lam + 4 rule under-covers small tiles where fluctuations
    dominate the mean: lam ~ 2.5 at tile 4 on the 128k/150^3 workload.)"""
    lam = n * tile**3 / float(shape[0] * shape[1] * shape[2])
    # +8 flat: structured (lattice) starts can systematically exceed a pure
    # fluctuation margin through grid commensuration — see
    # pencil_ibm.default_cap for the measured fcc case.
    return max(4, int(math.ceil(lam + 6.0 * math.sqrt(lam))) + 8)


def _bin_by_tile(pos, values, shape, box: Box, cap: int, tile, *,
                 with_pid=False):
    """-> sources [ntiles, cap, 3 + C] (xyz then values), tile-major order
    (plus an int32 pid bin [ntiles, cap], 1-based with 0 = empty, when
    ``with_pid``; kept as a separate integer sort column so ids stay exact
    for N > 2^24 where float32 packing would corrupt them).

    Two variadic sorts with one filler per slot (see engine/layout.py for
    the algorithm discussion); empties get EMPTY positions and zero values.
    """
    nt = _tile_counts(shape, tile)
    ntiles = nt[0] * nt[1] * nt[2]
    n = pos.shape[0]
    L = box.size.astype(pos.dtype)
    nvec = jnp.asarray(shape, jnp.int32)
    # grid-point space u in [0, n_d)
    frac = pos / L + 0.5
    frac = frac - jnp.floor(frac)
    u = frac * nvec
    tidx = jnp.minimum((u / tile).astype(jnp.int32), jnp.asarray(nt) - 1)
    key = (tidx[:, 0] * nt[1] + tidx[:, 1]) * nt[2] + tidx[:, 2]

    cols = [pos[:, 0], pos[:, 1], pos[:, 2]] + [values[:, c] for c in range(values.shape[1])]
    ncol = len(cols)
    filler_key = jnp.repeat(jnp.arange(ntiles, dtype=jnp.int32), cap)
    key2 = jnp.concatenate([key * 2, filler_key * 2 + 1])

    def pad(c, fill):
        return jnp.concatenate([c, jnp.full((ntiles * cap,), fill, c.dtype)])

    stream = (key2,) + tuple(
        pad(c, EMPTY if i < 3 else 0.0) for i, c in enumerate(cols)
    )
    if with_pid:
        pid_col = jnp.concatenate(
            [jnp.arange(1, n + 1, dtype=jnp.int32),
             jnp.zeros((ntiles * cap,), jnp.int32)]
        )
        stream = stream + (pid_col,)
    s = jax.lax.sort(stream, dimension=0, num_keys=1)
    cell = s[0] >> 1
    m = n + ntiles * cap
    idx = jnp.arange(m, dtype=jnp.int32)
    first = jnp.searchsorted(cell, cell, side="left").astype(jnp.int32)
    rank = idx - first
    kept = rank < cap
    overflow = jnp.any(((s[0] & 1) == 0) & (rank >= cap))
    slot = jnp.where(kept, cell * cap + rank, m + idx)
    s2 = jax.lax.sort((slot,) + s[1:], dimension=0, num_keys=1)
    T = ntiles * cap
    out = jnp.stack([c[:T] for c in s2[1:1 + ncol]], axis=-1)  # [T, 3+C]
    out = out.reshape(ntiles, cap, ncol)
    if with_pid:
        return out, s2[1 + ncol][:T].reshape(ntiles, cap), overflow
    return out, overflow


def _tile_centers(shape, Ls, dtype, tile):
    """Physical center coordinate of each tile per axis: [nt_d] arrays
    (jit-traceable — Ls may be traced box sizes).

    All kernel displacements are computed relative to the tile center with
    the source position min-imaged ONCE per (tile, source) pair — wrapping
    per grid point would alias the tile's ghost points onto real points and
    double count contributions."""
    outs = []
    for d in range(3):
        h = Ls[d] / shape[d]
        ntd = (shape[d] + tile - 1) // tile
        centers = (jnp.arange(ntd, dtype=dtype) * tile + tile / 2.0) * h \
            - Ls[d] / 2.0
        outs.append(centers)
    return outs


def _local_offsets(dtype, tile):
    """Grid-point offsets from the tile center, in units of h."""
    return jnp.arange(tile, dtype=dtype) - (tile - 1) / 2.0


def _wrap1(dx, L):
    return dx - L * jnp.round(dx / L)


def _gather_neighborhood(bins, nt):
    """bins [ntiles, cap, C] -> [ntiles, 27*cap, C] via rolls over tile axes."""
    ntx, nty, ntz = nt
    b = bins.reshape(ntx, nty, ntz, *bins.shape[1:])
    parts = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                parts.append(jnp.roll(b, (dx, dy, dz), axis=(0, 1, 2)))
    out = jnp.concatenate(parts, axis=3)
    return out.reshape(ntx * nty * ntz, -1, bins.shape[-1])


def spread_tiled(kernel, pos, values, shape, box: Box, *, cap=None,
                 chunk=1024, tile=None):
    """S: values [N] or [N, C] -> field [nx, ny, nz(, C)]. Same semantics as
    solvers.ibm.spread (1/dV density normalization)."""
    if tile is None:
        tile = pick_tile(shape, kernel.support)
    assert (kernel.support + 1) // 2 <= tile, \
        "kernel half-support must fit one tile"
    assert tile_shape_ok(shape, kernel.support, tile), (
        f"grid shape {tuple(shape)} has a partial trailing tile narrower "
        f"than the kernel half-support (support {kernel.support}, tile "
        f"{tile}); wrap contributions would be dropped — use ibm.spread"
    )
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    C = values.shape[1]
    nt = _tile_counts(shape, tile)
    ntiles = nt[0] * nt[1] * nt[2]
    n = pos.shape[0]
    if cap is None:
        cap = _default_cap(n, shape, tile)
    dtype = values.dtype
    Ls = box.size.astype(dtype)
    h = [Ls[d] / shape[d] for d in range(3)]
    inv_dV = 1.0 / (h[0] * h[1] * h[2])

    bins, overflow = _bin_by_tile(pos, values, shape, box, cap, tile)
    src = _gather_neighborhood(bins, nt)  # [ntiles, 27cap, 3+C]
    cx_, cy_, cz_ = _tile_centers(shape, Ls, dtype, tile)
    loc = _local_offsets(dtype, tile)  # [tile] in h units

    S = src.shape[1]
    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)

    def do_chunk(args):
        s_c, tx_c, ty_c, tz_c = args
        # source positions relative to the tile center (min-imaged once)
        rx = _wrap1(s_c[:, :, 0] - cx_[tx_c][:, None], Ls[0]) / h[0]
        ry = _wrap1(s_c[:, :, 1] - cy_[ty_c][:, None], Ls[1]) / h[1]
        rz = _wrap1(s_c[:, :, 2] - cz_[tz_c][:, None], Ls[2]) / h[2]
        # weights per axis: [Ct, S, tile]
        wx = kernel.phi(loc[None, None, :] - rx[:, :, None])
        wy = kernel.phi(loc[None, None, :] - ry[:, :, None])
        wz = kernel.phi(loc[None, None, :] - rz[:, :, None])
        vals = s_c[:, :, 3:]  # [Ct, S, C]
        wxy = wx[:, :, :, None] * wy[:, :, None, :]  # [Ct, S, t, t]
        wxy = wxy.reshape(wxy.shape[0], S, tile * tile)
        b = wz[:, :, :, None] * vals[:, :, None, :]  # [Ct, S, t, C]
        b = b.reshape(b.shape[0], S, tile * C)
        patch = jnp.einsum(
            "tsk,tsm->tkm", wxy, b, preferred_element_type=dtype
        )  # [Ct, t*t, t*C]
        return patch

    pad_t = (-ntiles) % chunk
    tid = jnp.concatenate([tile_ids, jnp.zeros((pad_t,), jnp.int32)]) if pad_t else tile_ids
    src_p = jnp.concatenate([src, jnp.zeros((pad_t,) + src.shape[1:], dtype)]) if pad_t else src
    patches = jax.lax.map(
        do_chunk,
        (
            src_p.reshape(-1, chunk, S, src.shape[-1]),
            (tid // (nt[1] * nt[2])).reshape(-1, chunk),
            ((tid // nt[2]) % nt[1]).reshape(-1, chunk),
            (tid % nt[2]).reshape(-1, chunk),
        ),
    )
    patches = patches.reshape(-1, tile * tile, tile * C)[:ntiles]
    patches = patches.reshape(ntiles, tile, tile, tile, C)
    # assemble [ntx*t, nty*t, ntz*t, C] then fold the padding back (PBC alias)
    field = patches.reshape(nt[0], nt[1], nt[2], tile, tile, tile, C)
    field = field.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        nt[0] * tile, nt[1] * tile, nt[2] * tile, C
    )
    # ghost points (tile padding) are redundant copies: every real grid
    # point belongs to exactly one tile, which pulls all sources within
    # reach — so padding is simply truncated (folding it back would double
    # count boundary contributions).
    field = field[: shape[0], : shape[1], : shape[2]]
    field = field * inv_dV
    return (field[..., 0] if squeeze else field), overflow


def _pad_field_tiles(field, shape, tile):
    """Zero-pad the field to tile multiples for window reads.

    Ghost points are ZERO (not periodic copies): each real point is read
    through the window block of the tile that owns it — periodic copies in
    the padding would be read a second time through the wrapped neighbor
    block and double count."""
    pads = []
    for d in range(3):
        target = _tile_counts(shape, tile)[d] * tile
        pads.append((0, target - field.shape[d]))
    pads.append((0, 0))
    return jnp.pad(field, pads)


def interpolate_tiled(kernel, pos, field, box: Box, *, cap=None, chunk=512,
                      tile=None):
    """J = S^*: field [nx, ny, nz(, C)] -> [N(, C)], adjoint of spread_tiled."""
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    C = field.shape[-1]
    shape = field.shape[:3]
    if tile is None:
        tile = pick_tile(shape, kernel.support)
    assert (kernel.support + 1) // 2 <= tile, \
        "kernel half-support must fit one tile"
    assert tile_shape_ok(shape, kernel.support, tile), (
        f"grid shape {tuple(shape)} has a partial trailing tile narrower "
        f"than the kernel half-support (support {kernel.support}, tile "
        f"{tile}); wrap contributions would be dropped — use ibm.interpolate"
    )
    nt = _tile_counts(shape, tile)
    ntiles = nt[0] * nt[1] * nt[2]
    n = pos.shape[0]
    if cap is None:
        cap = _default_cap(n, shape, tile)
    dtype = field.dtype
    Ls = box.size.astype(dtype)
    h = [Ls[d] / shape[d] for d in range(3)]

    # bin particles WITH their index (separate int32 column — exact for any
    # N, unlike float packing) so results can be unbinned
    bins, pid_bins, overflow = _bin_by_tile(
        pos, jnp.zeros((n, 0), dtype), shape, box, cap, tile, with_pid=True
    )
    # 27 per-offset passes: each contracts the particles' separable weights
    # against ONE rolled copy of the tiled field (memory stays ~2x the
    # field; materializing the (3t)^3 windows would cost 27x).
    fpad = _pad_field_tiles(field, shape, tile)
    ft = fpad.reshape(nt[0], tile, nt[1], tile, nt[2], tile, C).transpose(
        0, 2, 4, 1, 3, 5, 6
    )  # [ntx, nty, ntz, t, t, t, C]

    cx_, cy_, cz_ = _tile_centers(shape, Ls, dtype, tile)
    loc = _local_offsets(dtype, tile)
    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)

    def block_weights(svals, centers, t_c, L, hd, ntd, dt):
        """[Ct, cap, tile] weights vs the points of tile (t + dt)."""
        cb = centers[(t_c + dt) % ntd]
        r = _wrap1(svals - cb[:, None], L) / hd
        return kernel.phi(loc[None, None, :] - r[:, :, None])

    def make_chunk_fn(dx, dy, dz):
        def do_chunk(args):
            b_c, w_c, tx_c, ty_c, tz_c = args
            wx = block_weights(b_c[:, :, 0], cx_, tx_c, Ls[0], h[0], nt[0], dx)
            wy = block_weights(b_c[:, :, 1], cy_, ty_c, Ls[1], h[1], nt[1], dy)
            wz = block_weights(b_c[:, :, 2], cz_, tz_c, Ls[2], h[2], nt[2], dz)
            t1 = jnp.einsum("tpz,txyzc->tpxyc", wz, w_c)
            t2 = jnp.einsum("tpy,tpxyc->tpxc", wy, t1)
            out = jnp.einsum("tpx,tpxc->tpc", wx, t2)
            return out

        return do_chunk

    pad_t = (-ntiles) % chunk
    bins_p = (
        jnp.concatenate([bins, jnp.zeros((pad_t,) + bins.shape[1:], dtype)])
        if pad_t else bins
    )
    tid = (
        jnp.concatenate([tile_ids, jnp.zeros((pad_t,), jnp.int32)])
        if pad_t else tile_ids
    )
    txc = (tid // (nt[1] * nt[2])).reshape(-1, chunk)
    tyc = ((tid // nt[2]) % nt[1]).reshape(-1, chunk)
    tzc = (tid % nt[2]).reshape(-1, chunk)
    bins_c = bins_p.reshape(-1, chunk, *bins.shape[1:])

    outs = None
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                w_roll = jnp.roll(ft, (-dx, -dy, -dz), axis=(0, 1, 2))
                w_roll = w_roll.reshape(ntiles, tile, tile, tile, C)
                if pad_t:
                    w_roll = jnp.concatenate(
                        [w_roll,
                         jnp.zeros((pad_t,) + w_roll.shape[1:], dtype)]
                    )
                o = jax.lax.map(
                    make_chunk_fn(dx, dy, dz),
                    (bins_c,
                     w_roll.reshape(-1, chunk, *w_roll.shape[1:]),
                     txc, tyc, tzc),
                )
                outs = o if outs is None else outs + o
    outs = outs.reshape(-1, C)[: ntiles * cap]  # drop chunk-padding tiles
    pids = pid_bins.reshape(-1)
    # un-bin: sort by int pid (empties carry pid 0 -> sort first, sliced off)
    order = jax.lax.sort(
        (pids,) + tuple(outs[:, c] for c in range(C)), dimension=0, num_keys=1
    )
    result = jnp.stack(order[1:], axis=-1)[-n:]
    return (result[:, 0] if squeeze else result), overflow
