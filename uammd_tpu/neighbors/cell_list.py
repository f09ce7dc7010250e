"""Cell list: sort-based spatial binning.

TPU-native redesign of the reference CellList (reference:
src/Interactor/NeighbourList/CellList/CellListBase.cuh:30-230). The reference
hash-sorts particles and stores (cellStart, cellEnd) ranges with a counter
trick to avoid clearing; under XLA's static-shape model the natural layout is
instead a dense **cell grid**: an ``[n_cells, capacity]`` int32 table of
particle indices with a sentinel for empty slots. This gives every downstream
consumer (neighbour lists, MC sweeps, pair transversers) fully regular,
vectorizable indexing — the property that matters on TPU.

Overflow (a cell holding more than ``capacity`` particles) is reported in a
flag rather than by raising, mirroring the reference's device error-flag idiom
(CellListBase.cuh:82-85); host-side wrappers can then rebuild with a larger
capacity (see neighbor_list.ensure_capacity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.box import Box
from ..core.grid import Grid, grid_from_cutoff


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CellList:
    """Binned particles. ``cell_grid[c, k]`` = index of k-th particle in cell c,
    or ``n_particles`` (sentinel) if the slot is empty."""

    grid: Grid
    cell_grid: jax.Array  # [n_cells, capacity] int32
    cell_count: jax.Array  # [n_cells] int32
    particle_cell: jax.Array  # [N] int32 flat cell index of each particle
    overflow: jax.Array  # bool scalar: some cell exceeded capacity

    @property
    def capacity(self) -> int:
        return self.cell_grid.shape[1]

    @property
    def n_particles(self) -> int:
        return self.particle_cell.shape[0]


def build_cell_list(pos: jax.Array, grid: Grid, capacity: int) -> CellList:
    """Bin particles into the grid.

    Sort-based ranking (one argsort, O(N log N), maps to XLA's TPU sort):
    equivalent to the reference's hash-sort fill (CellListBase.cuh:69
    fillCellList) but produces the dense table directly.
    """
    n = pos.shape[0]
    ci = grid.cell_index(grid.cell_of(pos)).astype(jnp.int32)  # [N]
    order = jnp.argsort(ci)  # stable
    ci_sorted = ci[order]
    # rank of each sorted particle within its cell
    first = jnp.searchsorted(ci_sorted, ci_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.any(rank >= capacity)
    # Overflowing particles are routed out of bounds and dropped; every kept
    # slot index is unique so the scatter is trivially deterministic.
    oob = jnp.int32(grid.n_cells * capacity)
    slot = jnp.where(rank < capacity, ci_sorted * capacity + rank, oob)
    cell_grid = jnp.full((grid.n_cells * capacity,), n, dtype=jnp.int32)
    cell_grid = cell_grid.at[slot].set(order.astype(jnp.int32), mode="drop")
    cell_count = jax.ops.segment_sum(
        jnp.ones(n, jnp.int32), ci, num_segments=grid.n_cells
    )
    return CellList(
        grid=grid,
        cell_grid=cell_grid.reshape(grid.n_cells, capacity),
        cell_count=cell_count,
        particle_cell=ci,
        overflow=overflow,
    )


def stencil_offsets(radius: int = 1) -> jnp.ndarray:
    """[(2r+1)^3, 3] integer offsets of the neighbour-cell stencil."""
    r = radius
    ax = jnp.arange(-r, r + 1, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)


def neighbor_cell_indices(grid: Grid, cells: jax.Array, radius: int = 1) -> jax.Array:
    """Flat indices of the (2r+1)^3 cells around given cell coords [..., 3].

    Periodic wrap on periodic axes; on aperiodic axes out-of-range cells are
    clamped onto themselves (their occupants are distance-masked downstream),
    mirroring the reference's open-boundary cell handling (Box.cuh:32-40).
    """
    offs = stencil_offsets(radius)  # [S, 3]
    nbr = cells[..., None, :] + offs  # [..., S, 3]
    n = jnp.asarray(grid.shape, dtype=jnp.int32)
    periodic = jnp.asarray(grid.box.periodic)
    wrapped = jnp.mod(nbr, n)
    clamped = jnp.clip(nbr, 0, n - 1)
    nbr = jnp.where(periodic, wrapped, clamped)
    return grid.cell_index(nbr)  # [..., S]


def make_grid(box: Box, cutoff: float, min_cells: int = 3) -> Grid:
    return Grid(box=box, shape=grid_from_cutoff(box, cutoff, min_cells))
