"""Batched two-point boundary value solver on Chebyshev grids.

TPU-native analog of the reference BVP machinery (reference:
src/misc/BoundaryValueProblem/BVPSolver.cuh:1-243, KBPENTA.cuh): solves one

    y''(z) - k^2 y(z) = f(z),  z in [-H/2, H/2]

per transverse wavenumber (kx, ky), with per-k Robin boundary conditions

    alpha_top * y(H/2) + beta_top * y'(H/2) = g_top
    alpha_bot * y(-H/2) + beta_bot * y'(-H/2) = g_bot

The reference runs a pentadiagonal + Schur-complement recursion per k with a
CPU LAPACK precompute; the TPU-idiomatic form is: precompute the dense
INVERSE of each k's collocation operator once (setup, f64 on host), then
apply all of them per step as ONE batched [nk, n, n] @ [nk, n] matmul on the
MXU — no recursions, no scalar control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .chebyshev import cheb_derivative_matrix, lobatto_points


@dataclasses.dataclass(frozen=True)
class BatchedBVP:
    """Holds [nk, n, n] solve operators (host-precomputed inverses)."""

    inv_ops: jax.Array  # [nk, n, n]
    n: int

    def solve(self, rhs: jax.Array, g_top=None, g_bot=None) -> jax.Array:
        """rhs: [nk, n] (f at Lobatto points); returns y at Lobatto points.
        Boundary values g replace rows 0 / n-1 of the rhs."""
        b = rhs
        zero = jnp.zeros(b.shape[:-1], b.dtype)
        gt = zero if g_top is None else g_top
        gb = zero if g_bot is None else g_bot
        b = b.at[..., 0].set(gt).at[..., self.n - 1].set(gb)
        return jnp.einsum("kij,...kj->...ki", self.inv_ops, b)


def make_batched_bvp(
    k2_values,  # [nk] squared wavenumbers
    n: int,
    half_height: float,
    *,
    alpha_top=1.0, beta_top=0.0, alpha_bot=1.0, beta_bot=0.0,
) -> BatchedBVP:
    """Precompute dense solve operators for y'' - k^2 y = f with Robin BCs.

    alpha/beta may be scalars or [nk] arrays (per-k BCs — e.g. open
    boundaries use beta = ±1/k)."""
    k2 = np.atleast_1d(np.asarray(k2_values, np.float64))
    nk = k2.shape[0]
    D = cheb_derivative_matrix(n, half_height)
    D2 = D @ D
    eye = np.eye(n)

    def bc(v, nkv):
        return np.broadcast_to(np.asarray(v, np.float64), (nkv,))

    at, bt = bc(alpha_top, nk), bc(beta_top, nk)
    ab, bb = bc(alpha_bot, nk), bc(beta_bot, nk)

    ops = np.empty((nk, n, n))
    for i in range(nk):
        A = D2 - k2[i] * eye
        A[0, :] = at[i] * eye[0] + bt[i] * D[0]
        A[n - 1, :] = ab[i] * eye[n - 1] + bb[i] * D[n - 1]
        ops[i] = np.linalg.inv(A)
    return BatchedBVP(inv_ops=jnp.asarray(ops), n=n)


def solve_single(k2, n, half_height, f_vals, **bc_kwargs):
    """Convenience scalar-k solve (used in tests)."""
    bvp = make_batched_bvp(np.array([k2]), n, half_height, **bc_kwargs)
    return bvp.solve(jnp.asarray(f_vals)[None, :])[0]
