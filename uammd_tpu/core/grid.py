"""Regular grids over a periodic box.

TPU-native analog of the reference Grid (reference: src/utils/Grid.cuh:21-140):
cell-index math for binning and for spectral solvers, plus the FFT-friendly
size helper ``next_fft_size`` (reference: Grid.cuh:142, nextFFTWiseSize3D —
sizes of the form 2^a 3^b 5^c 7^d). On TPU, XLA's FFT is happiest with
powers of two, so ``prefer_pow2`` biases the search.

Grid dimensions are static Python ints: under ``jit`` they determine array
shapes, matching XLA's static-shape compilation model.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .box import Box


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Grid:
    box: Box
    shape: tuple = dataclasses.field(metadata={"static": True})  # (nx, ny, nz)

    @property
    def n_cells(self) -> int:
        return int(self.shape[0] * self.shape[1] * self.shape[2])

    @property
    def cell_size(self) -> jax.Array:
        return self.box.size / jnp.asarray(self.shape, dtype=self.box.size.dtype)

    def cell_of(self, pos: jax.Array) -> jax.Array:
        """Integer cell coordinates [..., 3] of positions (box centered at 0)."""
        n = jnp.asarray(self.shape)
        frac = self.box.to_fractional(pos)
        cell = jnp.floor(frac * n).astype(jnp.int32)
        # Guard against frac==1.0 from rounding at the upper boundary.
        return jnp.clip(cell, 0, n - 1)

    def cell_index(self, cell: jax.Array) -> jax.Array:
        """Flat index with x fastest (matches reference Grid.cuh:106 getCellIndex)."""
        nx, ny, _ = self.shape
        return cell[..., 0] + nx * (cell[..., 1] + ny * cell[..., 2])

    def cell_coords(self, flat: jax.Array) -> jax.Array:
        """Inverse of cell_index (x fastest): flat [...] -> coords [..., 3]."""
        nx, ny, _ = self.shape
        x = flat % nx
        y = (flat // nx) % ny
        z = flat // (nx * ny)
        return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)

    def wrap_cell(self, cell: jax.Array) -> jax.Array:
        n = jnp.asarray(self.shape)
        return jnp.mod(cell, n)

    def cell_centers(self, dtype=None) -> jax.Array:
        """[nx, ny, nz, 3] coordinates of cell centers."""
        dtype = dtype or self.box.size.dtype
        axes = [
            (jnp.arange(n, dtype=dtype) + 0.5) / n - 0.5
            for n in self.shape
        ]
        fx, fy, fz = jnp.meshgrid(*axes, indexing="ij")
        frac = jnp.stack([fx, fy, fz], axis=-1)
        return frac * self.box.size.astype(dtype)


def next_fft_size(
    n: int, prefer_pow2: bool = False, tile_safe_support: int | None = None,
    pencil_safe: bool = False
) -> int:
    """Smallest m >= n with only factors {2,3,5,7} (reference: Grid.cuh:142).

    With ``prefer_pow2``, returns the next power of two instead (TPU FFTs are
    fastest on powers of two). ``tile_safe_support`` additionally requires
    the size to be safe for the tiled spread/interpolate path with the given
    kernel support (solvers/tiled_ibm.tile_shape_ok: m % 8 == 0 or
    m % 8 >= ceil(support/2)); ``pencil_safe`` requires m % 8 == 0, keeping
    an x/y axis on the pencil MXU spread path (solvers/pencil_ibm) — so
    large-N spectral solvers stay on the fast scatter-free paths.
    """
    def tile_ok(m):
        if pencil_safe and m % 8 != 0:
            return False
        if tile_safe_support is None:
            return True
        half = (tile_safe_support + 1) // 2
        if half <= 4:
            # support <= 8 kernels run the faster tile-4 path
            # (tiled_ibm.pick_tile): require a multiple of 4 (every such m
            # is also tile-8 safe: m % 8 in {0, 4} with half <= 4)
            return m % 4 == 0
        w = m % 8
        return w == 0 or w >= half

    if prefer_pow2:
        m = 1 << max(0, (n - 1)).bit_length()
        return m  # powers of two >= 8 are always tile-safe
    m = max(1, n)
    while True:
        k = m
        for p in (2, 3, 5, 7):
            while k % p == 0:
                k //= p
        if k == 1 and tile_ok(m):
            return m
        m += 1


def grid_from_cutoff(box: Box, cutoff: float, min_cells: int = 3) -> tuple:
    """Cell counts so that each cell edge >= cutoff (for 27-stencil search)."""
    sizes = [float(s) for s in jax.device_get(box.size)]
    return tuple(max(min_cells, int(math.floor(s / cutoff))) for s in sizes)
