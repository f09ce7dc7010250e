"""Verlet neighbour list: fixed-capacity [N, K] index table with a skin.

TPU-native redesign of the reference VerletList (reference:
src/Interactor/NeighbourList/VerletList/VerletListBase.cuh:56-73 and
BasicList/BasicListBase.cuh:32-41). The list stores up to ``max_neighbors``
indices per particle inside ``cutoff * skin_multiplier`` and is only rebuilt
when some particle has drifted more than half the skin since the last build
(the reference's checkMaximumDrift kernel, VerletListBase.cuh:56-70).

XLA needs static shapes, so capacity overflow cannot grow the table inside
``jit``; instead an ``overflow`` flag is set (the reference's error-flag +
regrow idiom, docs/NeighbourList.rst:244) and host-side ``ensure_capacity``
re-binds a bigger table between scans.

The rebuild itself is chunked with ``lax.map`` so the [chunk, S*capacity]
candidate tensors stay well inside HBM even at N = several million.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..core.box import Box
from ..core.grid import Grid, grid_from_cutoff
from .cell_list import build_cell_list, neighbor_cell_indices


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeighborList:
    """idx[i, k] = index of k-th neighbour of i, or N (sentinel) if unused."""

    idx: jax.Array  # [N, K] int32
    ref_pos: jax.Array  # [N, 3] positions at build time (drift check)
    overflow: jax.Array  # bool: K or cell capacity exceeded at last build
    box: Box
    cutoff: float = dataclasses.field(metadata={"static": True})
    skin_multiplier: float = dataclasses.field(metadata={"static": True})
    grid_shape: tuple = dataclasses.field(metadata={"static": True})
    cell_capacity: int = dataclasses.field(metadata={"static": True})
    chunk: int = dataclasses.field(default=32768, metadata={"static": True})
    include_self: bool = dataclasses.field(default=False, metadata={"static": True})

    @property
    def max_neighbors(self) -> int:
        return self.idx.shape[1]

    @property
    def n(self) -> int:
        return self.idx.shape[0]

    def needs_rebuild(self, pos: jax.Array) -> jax.Array:
        """True if some particle moved > skin/2 since build
        (reference: VerletListBase.cuh:56-70 checkMaximumDrift)."""
        skin = (self.skin_multiplier - 1.0) * self.cutoff
        dr = self.box.wrap(pos - self.ref_pos)
        max_d2 = jnp.max(jnp.sum(dr * dr, axis=-1))
        return max_d2 > jnp.asarray((0.5 * skin) ** 2, pos.dtype)


def _auto_max_neighbors(n, volume, r, safety=1.25, minimum=16):
    rho = n / volume
    est = rho * (4.0 / 3.0) * math.pi * r**3 * safety + 8
    k = max(minimum, int(math.ceil(est)))
    return (k + 7) // 8 * 8  # pad to VPU sublane multiple


def _rebuild(
    pos: jax.Array,
    box: Box,
    cutoff: float,
    skin_multiplier: float,
    grid_shape: tuple,
    cell_capacity: int,
    max_neighbors: int,
    chunk: int,
    include_self: bool,
) -> NeighborList:
    """Jit-safe rebuild: all shape-determining params are static."""
    n = pos.shape[0]
    grid = Grid(box=box, shape=grid_shape)
    rl = cutoff * skin_multiplier
    cl = build_cell_list(pos, grid, cell_capacity)
    cell_coords = grid.cell_coords(jnp.arange(grid.n_cells))
    stencil = neighbor_cell_indices(grid, cell_coords)  # [n_cells, 27]

    rl2 = jnp.asarray(rl * rl, pos.dtype)
    pos_pad = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], axis=0)

    def one_chunk(args):
        idx_chunk, pos_chunk, ci_chunk = args
        cand = cl.cell_grid[stencil[ci_chunk]]  # [C, 27, cap]
        cand = cand.reshape(cand.shape[0], -1)  # [C, S]
        dr = box.wrap(pos_pad[cand] - pos_chunk[:, None, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (cand < n) & (r2 <= rl2)
        if not include_self:
            valid &= cand != idx_chunk[:, None]
        n_valid = jnp.sum(valid, axis=1)
        # compact: valid candidates first (stable partition via argsort of ~valid)
        order = jnp.argsort(~valid, axis=1, stable=True)[:, :max_neighbors]
        cand_sorted = jnp.take_along_axis(cand, order, axis=1)
        valid_sorted = jnp.take_along_axis(valid, order, axis=1)
        return jnp.where(valid_sorted, cand_sorted, n), n_valid

    chunk = min(chunk, n)
    idx_all = jnp.arange(n, dtype=jnp.int32)
    pad = (-n) % chunk
    idx_p = (
        jnp.concatenate([idx_all, jnp.full((pad,), n - 1, jnp.int32)]) if pad else idx_all
    )
    nb, nv = jax.lax.map(
        one_chunk,
        (
            idx_p.reshape(-1, chunk),
            pos_pad[idx_p].reshape(-1, chunk, 3),
            cl.particle_cell[jnp.minimum(idx_p, n - 1)].reshape(-1, chunk),
        ),
    )
    nb = nb.reshape(-1, max_neighbors)[:n]
    nv = nv.reshape(-1)[:n]
    overflow = cl.overflow | jnp.any(nv > max_neighbors)
    return NeighborList(
        idx=nb,
        ref_pos=pos,
        overflow=overflow,
        box=box,
        cutoff=cutoff,
        skin_multiplier=skin_multiplier,
        grid_shape=grid_shape,
        cell_capacity=cell_capacity,
        chunk=chunk,
        include_self=include_self,
    )


def build_neighbor_list(
    pos: jax.Array,
    box: Box,
    cutoff: float,
    *,
    skin_multiplier: float = 1.2,
    max_neighbors: int | None = None,
    cell_capacity: int | None = None,
    chunk: int = 32768,
    include_self: bool = False,
) -> NeighborList:
    """Build an [N, K] neighbour list (host entry point; sizes auto-chosen).

    Equivalent path in the reference: CellList::update + fillBasicNeighbourList
    (BasicListBase.cuh:41) with the Verlet skin from VerletList.cuh:83.
    Call once outside ``jit``; subsequent in-jit refreshes go through
    ``maybe_rebuild`` and reuse the static sizes chosen here.
    """
    n = pos.shape[0]
    rl = cutoff * skin_multiplier
    grid_shape = grid_from_cutoff(box, rl)
    volume = float(jax.device_get(jnp.prod(box.size)))
    if cell_capacity is None:
        n_cells = grid_shape[0] * grid_shape[1] * grid_shape[2]
        cell_capacity = max(4, int(math.ceil(n / n_cells * 2.0)) + 4)
    if max_neighbors is None:
        max_neighbors = _auto_max_neighbors(n, volume, rl)
    return _rebuild(
        pos, box, cutoff, skin_multiplier, grid_shape, cell_capacity,
        max_neighbors, chunk, include_self,
    )


def rebuild_neighbor_list(nlist: NeighborList, pos: jax.Array) -> NeighborList:
    """Unconditional rebuild with the list's stored static sizes (jit-safe)."""
    new = _rebuild(
        pos,
        nlist.box,
        nlist.cutoff,
        nlist.skin_multiplier,
        nlist.grid_shape,
        nlist.cell_capacity,
        nlist.max_neighbors,
        nlist.chunk,
        nlist.include_self,
    )
    return dataclasses.replace(new, overflow=new.overflow | nlist.overflow)


def maybe_rebuild(nlist: NeighborList, pos: jax.Array) -> NeighborList:
    """Rebuild iff drifted; both branches trace but only one executes at runtime.

    This is the jit-compatible analog of the reference's lazy VerletList
    update (VerletList.cuh:83)."""
    return jax.lax.cond(
        nlist.needs_rebuild(pos),
        lambda _: rebuild_neighbor_list(nlist, pos),
        lambda _: nlist,
        None,
    )


def ensure_capacity(nlist: NeighborList, pos: jax.Array) -> NeighborList:
    """Host-side loop: regrow max_neighbors until no overflow (outside jit).

    Mirrors the reference's auto-regrow of BasicNeighbourList
    (docs/NeighbourList.rst:244 — capacity grown in multiples of 32).
    """
    while bool(jax.device_get(nlist.overflow)):
        nlist = _rebuild(
            pos,
            nlist.box,
            nlist.cutoff,
            nlist.skin_multiplier,
            nlist.grid_shape,
            nlist.cell_capacity * 2,
            nlist.max_neighbors * 2,
            nlist.chunk,
            nlist.include_self,
        )
    return nlist
