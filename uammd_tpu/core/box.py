"""Periodic simulation box.

TPU-native analog of the reference Box (reference: src/utils/Box.cuh:16-60):
an orthorhombic box with per-axis periodicity. The reference disables an axis
by setting ``minusInvBoxSize`` to zero (Box.cuh:32-40); here we carry an
explicit static ``periodic`` mask and multiply the wrap term by it, which XLA
constant-folds when the mask is static.

The box is a pytree so it can be donated/scanned; ``periodic`` is static
metadata (it changes the compiled program, like the reference's branch-free
trick changes the arithmetic).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import default_real


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Box:
    size: jax.Array  # [3] box lengths (L may be inf on aperiodic axes)
    periodic: tuple = dataclasses.field(
        default=(True, True, True), metadata={"static": True}
    )

    @property
    def volume(self):
        return jnp.prod(self.size)

    def wrap(self, dr: jax.Array) -> jax.Array:
        """Minimum-image convention displacement (reference: Box.cuh apply_pbc)."""
        mask = jnp.asarray(self.periodic, dtype=dr.dtype)
        size = self.size.astype(dr.dtype)
        return dr - size * mask * jnp.round(dr / size)

    def wrap_position(self, pos: jax.Array) -> jax.Array:
        """Fold positions into [-L/2, L/2) on periodic axes."""
        mask = jnp.asarray(self.periodic, dtype=pos.dtype)
        size = self.size.astype(pos.dtype)
        return pos - size * mask * jnp.round(pos / size)

    def to_fractional(self, pos: jax.Array) -> jax.Array:
        """Map positions to [0, 1) fractional coordinates."""
        size = self.size.astype(pos.dtype)
        frac = pos / size + 0.5
        return frac - jnp.floor(frac)


def box(size, periodic=(True, True, True), dtype=None) -> Box:
    dtype = dtype or default_real
    size = jnp.atleast_1d(jnp.asarray(size, dtype=dtype))
    if size.shape == (1,):
        size = jnp.full((3,), size[0], dtype=dtype)
    return Box(size=size, periodic=tuple(bool(p) for p in periodic))
