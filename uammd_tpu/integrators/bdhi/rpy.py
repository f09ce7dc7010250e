"""Rotne-Prager-Yamakawa mobility and dense backends.

TPU-native analog of the reference BDHI core (reference:
src/Integrator/BDHI/BDHI.cuh:13-70 RotnePragerYamakawa,
BDHI_Cholesky.cuh:33-45, BDHI_Lanczos.cuh:25-40).

The RPY tensor (open boundaries, regularized for overlaps):

  r >= 2a:  M(r) = M0 * 3a/(4r) [ (1 + 2a^2/(3r^2)) I + (1 - 2a^2/r^2) rr^ ]
  r <  2a:  M(r) = M0 [ (1 - 9r/(32a)) I + (3r/(32a)) rr^ ]
  self:     M0 I,   M0 = 1/(6 pi eta a)

Backends:
- ``dense_mobility`` builds the 3N x 3N matrix: M F on the MXU, and
  sqrt(M) dW via ``jnp.linalg.cholesky`` — the Cholesky backend
  (BDHI_Cholesky.cuh) is a single fused TPU-friendly path here.
- ``rpy_matvec`` applies M matrix-free in O(N^2) tiles for the Lanczos
  backend (BDHI_Lanczos.cuh uses the same NBody sweep).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rpy_pair_blocks(dr, a, m0):
    """RPY 3x3 blocks for displacement vectors dr [..., 3]."""
    r2 = jnp.sum(dr * dr, axis=-1)
    r = jnp.sqrt(r2 + 1e-32)
    far = r >= 2.0 * a
    rs = jnp.maximum(r, 1e-16)
    # far field
    c1f = m0 * (3.0 * a / (4.0 * rs)) * (1.0 + 2.0 * a * a / (3.0 * r2 + 1e-32))
    c2f = m0 * (3.0 * a / (4.0 * rs)) * (1.0 - 2.0 * a * a / (r2 + 1e-32))
    # near field (regularized overlap)
    c1n = m0 * (1.0 - 9.0 * r / (32.0 * a))
    c2n = m0 * (3.0 / (32.0 * a)) * r
    c1 = jnp.where(far, c1f, c1n)
    c2 = jnp.where(far, c2f, c2n)
    rhat = dr / rs[..., None]
    eye = jnp.eye(3, dtype=dr.dtype)
    outer = rhat[..., :, None] * rhat[..., None, :]
    blocks = c1[..., None, None] * eye + c2[..., None, None] * outer
    # self block (r == 0)
    self_block = m0 * eye
    return jnp.where((r2 > 1e-24)[..., None, None], blocks, self_block)


def dense_mobility(pos, *, viscosity=1.0, radius=1.0, box=None):
    """[3N, 3N] RPY mobility (open or minimum-image periodic)."""
    n = pos.shape[0]
    m0 = 1.0 / (6.0 * math.pi * viscosity * radius)
    dr = pos[None, :, :] - pos[:, None, :]
    if box is not None:
        dr = box.wrap(dr)
    blocks = rpy_pair_blocks(dr, radius, m0)  # [N, N, 3, 3]
    return blocks.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)


def rpy_matvec(pos, f, *, viscosity=1.0, radius=1.0, box=None, chunk=1024):
    """Matrix-free M @ f with f [N, 3]; O(N^2) tiled (reference: the NBody
    RPY sweep in BDHI_Lanczos.cu)."""
    n = pos.shape[0]
    m0 = 1.0 / (6.0 * math.pi * viscosity * radius)

    def row_block(i_block):
        dr = pos[None, :, :] - pos[i_block][:, None, :]
        if box is not None:
            dr = box.wrap(dr)
        blocks = rpy_pair_blocks(dr, radius, m0)  # [C, N, 3, 3]
        return jnp.einsum("cnab,nb->ca", blocks, f)

    chunk = min(chunk, n)
    pad = (-n) % chunk
    rows = jnp.arange(n + pad, dtype=jnp.int32) % n
    out = jax.lax.map(row_block, rows.reshape(-1, chunk))
    return out.reshape(-1, 3)[:n]


def cholesky_sqrt_dot(M, z):
    """B z with B B^T = M via dense Cholesky (reference: BDHI_Cholesky.cuh
    uses cuSOLVER potrf; here one fused jnp.linalg.cholesky on the MXU)."""
    L = jnp.linalg.cholesky(M)
    return L @ z
