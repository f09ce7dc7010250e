"""Lanczos Krylov solver for sqrt(M) @ v with matrix-free M.

TPU-native analog of the reference Lanczos algorithm (reference:
src/misc/LanczosAlgorithm.cuh:32-56, misc/LanczosAlgorithm/): computes
B v = sqrt(M) v for a symmetric positive-(semi)definite operator given only
``mv(x) -> M x``, used for Brownian noise B dW with M the RPY mobility
(BDHI::Lanczos, PSE near field, DPStokes noise).

Approach: m-step Lanczos tridiagonalization -> B v ~ |v| V sqrt(T) e1, with
sqrt(T) via eigendecomposition of the small tridiagonal (done with jnp.linalg
on the m x m matrix — negligible). Runs a fixed, static number of iterations
(XLA-friendly); ``lanczos_sqrt_apply`` also reports the iteration-to-iteration
residual so callers can validate m a posteriori, mirroring the reference's
tolerance loop (LanczosAlgorithm.cuh:40-56).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lanczos_sqrt_apply(mv, v: jax.Array, m: int = 32, w0=None):
    """Return (sqrt(M) v approximation, residual_estimate).

    ``mv``: callable x -> M x on flattened vectors; ``v``: [K] vector.

    ``w0`` optionally supplies the precomputed first matvec M v (of the
    UN-normalized v): iteration 0 is peeled out of the loop and skips its
    ``mv`` call. Callers that can batch M v with another matvec (e.g. the
    PSE near field fusing M F with the first noise matvec into one kernel
    pass) save one full operator application per sqrt.
    """
    k = v.shape[0]
    dtype = v.dtype
    vnorm = jnp.linalg.norm(v)
    v0 = v / jnp.where(vnorm > 0, vnorm, 1.0)

    V = jnp.zeros((m + 1, k), dtype).at[0].set(v0)
    alphas = jnp.zeros((m,), dtype)
    betas = jnp.zeros((m + 1,), dtype)  # betas[0] unused

    def body(i, carry, w=None):
        V, alphas, betas = carry
        if w is None:
            w = mv(V[i])
        w = w - betas[i] * V[i - 1] * (i > 0)
        a = jnp.vdot(V[i], w)
        w = w - a * V[i]
        # full reorthogonalization (cheap at small m, stabilizes f32)
        proj = V @ w  # [m+1]
        mask = (jnp.arange(m + 1) <= i).astype(dtype)
        w = w - (proj * mask) @ V
        b = jnp.linalg.norm(w)
        V = V.at[i + 1].set(w / jnp.where(b > 1e-30, b, 1.0))
        return V, alphas.at[i].set(a), betas.at[i + 1].set(b)

    carry = (V, alphas, betas)
    if w0 is not None:
        # M v0 = (M v) / ||v||, by linearity
        carry = body(0, carry, w=w0 / jnp.where(vnorm > 0, vnorm, 1.0))
        V, alphas, betas = jax.lax.fori_loop(1, m, body, carry)
    else:
        V, alphas, betas = jax.lax.fori_loop(0, m, body, carry)

    # T = tridiag(alphas, betas[1:m]); sqrt via eigh
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[1:m], 1)
        + jnp.diag(betas[1:m], -1)
    )
    evals, evecs = jnp.linalg.eigh(T)
    sq = evecs @ (jnp.sqrt(jnp.maximum(evals, 0.0)) * evecs[0, :])  # sqrt(T) e1
    result = vnorm * (sq @ V[:m])

    # residual estimate: contribution of the last Krylov direction
    res = jnp.abs(vnorm * sq[-1]) / jnp.where(vnorm > 0, vnorm, 1.0)
    return result, res


def make_sqrt_m_dot(mv, m: int = 32):
    return partial(lanczos_sqrt_apply, mv, m=m)


def lanczos_tridiag(mv, v: jax.Array, m: int):
    """One m-step Lanczos pass returning (vnorm, alphas[m], betas[m+1]).

    With the full reorthogonalization above, V is orthonormal, so the
    host can reconstruct the *norm* of the sqrt(M)v approximation at every
    intermediate iteration j <= m from the tridiagonal alone:
    ``|| B_j v - B_{j-1} v || = vnorm * || pad(sqrt(T_j) e1) - pad(sqrt(T_{j-1}) e1) ||``
    — the reference's a-posteriori convergence measure
    (reference: src/misc/LanczosAlgorithm.cuh:40-56) without re-running
    the expensive matvec sweep per candidate j.
    """
    k = v.shape[0]
    dtype = v.dtype
    vnorm = jnp.linalg.norm(v)
    v0 = v / jnp.where(vnorm > 0, vnorm, 1.0)
    V = jnp.zeros((m + 1, k), dtype).at[0].set(v0)
    alphas = jnp.zeros((m,), dtype)
    betas = jnp.zeros((m + 1,), dtype)

    def body(i, carry):
        V, alphas, betas = carry
        w = mv(V[i])
        w = w - betas[i] * V[i - 1] * (i > 0)
        a = jnp.vdot(V[i], w)
        w = w - a * V[i]
        proj = V @ w
        mask = (jnp.arange(m + 1) <= i).astype(dtype)
        w = w - (proj * mask) @ V
        b = jnp.linalg.norm(w)
        V = V.at[i + 1].set(w / jnp.where(b > 1e-30, b, 1.0))
        return V, alphas.at[i].set(a), betas.at[i + 1].set(b)

    V, alphas, betas = jax.lax.fori_loop(0, m, body, (V, alphas, betas))
    return vnorm, alphas, betas


def lanczos_iterations_for_tolerance(alphas, betas, tol: float,
                                     m_min: int = 3) -> int:
    """Smallest j with ||B_j v - B_{j-1} v|| / ||B_j v|| < tol, from a
    recorded tridiagonal (host-side numpy; the j x j eigh is negligible)."""
    import numpy as np

    alphas = np.asarray(alphas, np.float64)
    betas = np.asarray(betas, np.float64)
    m = alphas.shape[0]

    def sq_e1(j):
        T = (np.diag(alphas[:j]) + np.diag(betas[1:j], 1)
             + np.diag(betas[1:j], -1))
        evals, evecs = np.linalg.eigh(T)
        return evecs @ (np.sqrt(np.maximum(evals, 0.0)) * evecs[0, :])

    prev = None
    for j in range(1, m + 1):
        cur = sq_e1(j)
        if prev is not None and j >= m_min:
            d = np.linalg.norm(np.concatenate([prev, [0.0]]) - cur)
            if d / max(np.linalg.norm(cur), 1e-30) < tol:
                return j
        prev = cur
    return m
