"""Chebyshev spectral tools: fast transforms, differentiation, quadrature.

TPU-native analog of the reference Chebyshev utilities (reference:
src/misc/Chebyshev/FastChebyshevTransform.cuh:1-35, misc/ChevyshevUtils.cuh),
used by the doubly periodic solvers (DPStokes, DPPoissonSlab). The fast
Chebyshev transform is an FFT of the even extension (a DCT-I), exactly the
reference's cuFFT+twiddle construction, on XLA's TPU FFT.

Grid: Chebyshev-Gauss-Lobatto points z_j = cos(pi j / (n-1)), j = 0..n-1,
mapped to a slab [-H/2, H/2] by z -> z * H/2.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def lobatto_points(n: int, half_height: float = 1.0) -> np.ndarray:
    """z_j = cos(pi j/(n-1)) * half_height (z_0 = +H/2 ... z_{n-1} = -H/2)."""
    return np.cos(np.pi * np.arange(n) / (n - 1)) * half_height


def fct_matrix(n: int) -> np.ndarray:
    """[n, n] matrix: values at Lobatto points -> Chebyshev coefficients.

    f(z_j) = sum_k c_k cos(pi k j/(n-1)). For the slab sizes used here
    (n <= 128) a dense matmul runs on the MXU and beats FFT plumbing — the
    TPU-idiomatic form of the reference's cuFFT-based FastChebyshevTransform.
    """
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    C = np.cos(np.pi * k * j / (n - 1)) * 2.0 / (n - 1)
    C[:, 0] *= 0.5
    C[:, -1] *= 0.5
    C[0] *= 0.5
    C[-1] *= 0.5
    return C


def ifct_matrix(n: int) -> np.ndarray:
    """[n, n] matrix: Chebyshev coefficients -> values at Lobatto points."""
    k = np.arange(n)[None, :]
    j = np.arange(n)[:, None]
    return np.cos(np.pi * k * j / (n - 1))


def fct(values: jax.Array, axis: int = -1) -> jax.Array:
    v = jnp.moveaxis(values, axis, -1)
    M = jnp.asarray(fct_matrix(v.shape[-1]), v.dtype)
    return jnp.moveaxis(v @ M.T, -1, axis)


def ifct(coeffs: jax.Array, axis: int = -1) -> jax.Array:
    c = jnp.moveaxis(coeffs, axis, -1)
    M = jnp.asarray(ifct_matrix(c.shape[-1]), c.dtype)
    return jnp.moveaxis(c @ M.T, -1, axis)


def cheb_derivative_matrix(n: int, half_height: float = 1.0) -> np.ndarray:
    """Dense Chebyshev collocation differentiation matrix on Lobatto points
    (Trefethen's construction), scaled to the physical slab."""
    x = np.cos(np.pi * np.arange(n) / (n - 1))
    c = np.ones(n)
    c[0] = c[-1] = 2.0
    c *= (-1.0) ** np.arange(n)
    X = np.tile(x, (n, 1)).T
    dX = X - X.T + np.eye(n)
    D = np.outer(c, 1.0 / c) / dX
    D -= np.diag(D.sum(axis=1))
    return D / half_height


def clenshaw_curtis_weights(n: int, half_height: float = 1.0) -> np.ndarray:
    """Integration weights on Lobatto points (for slab averages)."""
    # exact weights via the coefficient route: integral of T_k over [-1,1]
    k = np.arange(n)
    integ = np.where(k % 2 == 0, 2.0 / (1.0 - k**2 + (k == 1)), 0.0)
    integ[1] = 0.0
    # w_j = sum_k integ_k * C_kj where C is the fct matrix
    j = np.arange(n)
    C = np.cos(np.pi * np.outer(k, j) / (n - 1)) * 2.0 / (n - 1)
    C[0] *= 0.5
    C[-1] *= 0.5
    C[:, 0] *= 0.5
    C[:, -1] *= 0.5
    return (integ @ C) * half_height
