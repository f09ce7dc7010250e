"""Counter-based stateless RNG utilities.

The reference uses three RNG families (reference: src/third_party/saruprng.cuh;
System.h:108,202-203): a host Xorshift128+ for seeds, curand for bulk noise
fills, and Saru — a counter-based generator seeded per (pair, step) so pair
noise needs no stored state and is symmetric in (i, j). Used by DPD
(reference: src/Interactor/Potential/DPD.cuh:41) and thermostats.

TPU-native equivalents:
- bulk noise: ``jax.random.normal`` with keys threaded through ``SimState``
  (threefry is itself counter-based).
- per-pair/per-step noise: ``pair_uniform``/``pair_normal`` below — a cheap
  integer mix (xxhash/murmur-style avalanche, same design point as Saru)
  evaluated elementwise on the VPU, so a [N, K] neighbour table gets its
  noise with zero gathers and exact (i, j) symmetry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _mix(h):
    """murmur3-style finalizer: avalanche a uint32."""
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hash_u32(*words) -> jax.Array:
    """Hash several int words (broadcast) into uniform uint32."""
    h = _U32(0x9E3779B9)
    for w in words:
        w = jnp.asarray(w).astype(_U32)
        h = _mix(h ^ w) * _U32(0x01000193) + _U32(0x6A09E667)
    return _mix(h)


def pair_counter(i, j) -> jax.Array:
    """Symmetric pair counter: same value for (i,j) and (j,i).

    Mirrors Saru's symmetric per-pair seeding in DPD
    (reference: src/Interactor/Potential/DPD.cuh:106-120).
    """
    lo = jnp.minimum(i, j).astype(_U32)
    hi = jnp.maximum(i, j).astype(_U32)
    return hash_u32(lo, hi)


def uniform_from_bits(bits: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint32 bits -> uniform in [0, 1)."""
    scale = jnp.asarray(1.0 / (1 << 24), dtype)
    return (bits >> 8).astype(dtype) * scale


def pair_uniform(i, j, counter, dtype=jnp.float32) -> jax.Array:
    """Uniform [0,1) symmetric in (i,j), distinct per counter (e.g. step)."""
    return uniform_from_bits(hash_u32(pair_counter(i, j), counter), dtype)


def pair_normal(i, j, counter, dtype=jnp.float32) -> jax.Array:
    """Standard normal, symmetric in (i,j), via Box-Muller on two hashes."""
    c = pair_counter(i, j)
    u1 = uniform_from_bits(hash_u32(c, counter, _U32(0xDEADBEEF)), dtype)
    u2 = uniform_from_bits(hash_u32(c, counter, _U32(0xCAFEF00D)), dtype)
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)
    return (r * jnp.cos(two_pi * u2)).astype(dtype)
