"""Pencil MXU spread/interpolate vs the direct implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.solvers.ibm import (
    GaussianKernel,
    Peskin3pt,
    interpolate,
    interpolate_auto,
    spread,
    spread_auto,
)
from uammd_tpu.solvers.pencil_ibm import (
    bin_pencils,
    interpolate_pencil,
    pencil_ok,
    spread_pencil,
)


@pytest.mark.parametrize(
    "m,kern",
    [
        ((32, 40, 36), GaussianKernel(sigma=1.2, support=8)),
        ((24, 24, 17), GaussianKernel(sigma=1.0, support=6)),
        ((16, 16, 9), Peskin3pt()),
        ((16, 16, 8), GaussianKernel(sigma=1.2, support=8)),
        ((40, 32, 20), GaussianKernel(sigma=1.5, support=12)),
    ],
    ids=["gauss8", "gauss6", "peskin3-min", "gauss8-min", "gauss12"],
)
def test_pencil_matches_direct(m, kern):
    rng = np.random.default_rng(0)
    n = 500
    Ls = [mm * 0.61 for mm in m]
    b = box(Ls, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(Ls))
    q = jnp.asarray(rng.normal(size=(n, 3)))
    assert pencil_ok(m, kern.support)
    bins = bin_pencils(pos, m, b)
    f_ref = spread(kern, pos, q, m, b)
    f_p, ovf = spread_pencil(kern, pos, q, m, b, bins)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref), atol=1e-12)
    u = jnp.asarray(rng.normal(size=m + (3,)))
    v_ref = interpolate(kern, pos, u, b)
    v_p, _ = interpolate_pencil(kern, pos, u, b, bins)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref), atol=1e-12)
    # adjointness: <S q, u> dV = <q, J u>
    dV = float(np.prod([Ls[d] / m[d] for d in range(3)]))
    lhs = float(jnp.vdot(f_p, u)) * dV
    rhs = float(jnp.vdot(q, v_p))
    assert abs(lhs - rhs) <= 1e-10 * abs(rhs)


def test_pencil_ok_predicate():
    assert pencil_ok((16, 16, 8), 8)
    assert not pencil_ok((16, 16, 7), 8)   # nz < support
    assert not pencil_ok((12, 16, 8), 8)   # x not a multiple of 8
    assert not pencil_ok((8, 16, 8), 8)    # nx < 8 + 2*halo
    assert pencil_ok((24, 24, 24), 16)     # halo 8 fits the fold reach
    assert not pencil_ok((24, 24, 24), 18)  # halo 9 would skip a pencil


def test_pencil_scalar_and_chunking():
    rng = np.random.default_rng(1)
    m, kern = (32, 24, 18), GaussianKernel(sigma=1.1, support=8)
    n, Ls = 700, [mm * 0.5 for mm in m]
    b = box(Ls, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(Ls))
    q = jnp.asarray(rng.normal(size=(n,)))
    bins = bin_pencils(pos, m, b)
    f_ref = spread(kern, pos, q, m, b)
    for chunk in (None, 4, 7):
        f_p, _ = spread_pencil(kern, pos, q, m, b, bins, chunk=chunk)
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                                   atol=1e-12)
    u = jnp.asarray(rng.normal(size=m))
    v_ref = interpolate(kern, pos, u, b)
    for chunk in (None, 4, 7):
        v_p, _ = interpolate_pencil(kern, pos, u, b, bins, chunk=chunk)
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref),
                                   atol=1e-12)


def test_pencil_shared_bins_two_kernels():
    """One binning serves two kernels of different width (force + torque)."""
    rng = np.random.default_rng(2)
    m = (24, 24, 24)
    n, Ls = 300, [mm * 0.7 for mm in m]
    b = box(Ls, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(Ls))
    q = jnp.asarray(rng.normal(size=(n, 3)))
    bins = bin_pencils(pos, m, b)
    for kern in (GaussianKernel(sigma=1.3, support=8),
                 GaussianKernel(sigma=0.9, support=6)):
        f_p, _ = spread_pencil(kern, pos, q, m, b, bins)
        np.testing.assert_allclose(
            np.asarray(f_p), np.asarray(spread(kern, pos, q, m, b)),
            atol=1e-12,
        )


def test_pencil_overflow_flag():
    rng = np.random.default_rng(3)
    m = (16, 16, 16)
    Ls = [8.0, 8.0, 8.0]
    b = box(Ls, dtype=jnp.float64)
    # all particles piled into one pencil with a tiny forced cap
    pos = jnp.asarray(rng.normal(scale=0.05, size=(40, 3)))
    bins = bin_pencils(pos, m, b, cap=8)
    assert bool(bins.overflow)


def test_auto_dispatch_uses_pencil():
    """spread_auto over threshold on a pencil-safe grid matches direct."""
    rng = np.random.default_rng(4)
    m, kern = (24, 24, 20), GaussianKernel(sigma=1.2, support=8)
    n, Ls = 5000, [mm * 0.5 for mm in m]
    b = box(Ls, dtype=jnp.float64)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(Ls))
    q = jnp.asarray(rng.normal(size=(n, 3)))
    f_auto = spread_auto(kern, pos, q, m, b, threshold=4096)
    np.testing.assert_allclose(
        np.asarray(f_auto), np.asarray(spread(kern, pos, q, m, b)),
        atol=1e-12,
    )
    u = jnp.asarray(rng.normal(size=m + (3,)))
    v_auto = interpolate_auto(kern, pos, u, b, threshold=4096)
    np.testing.assert_allclose(
        np.asarray(v_auto), np.asarray(interpolate(kern, pos, u, b)),
        atol=1e-12,
    )


def test_pencil_slack_staleness_exact():
    """Bins built at old positions stay EXACT (vs the direct path at the
    CURRENT positions) while x/y drift < slack*h — the persistent-bins
    contract of the slot-resident EM loop."""
    rng = np.random.default_rng(7)
    m, kern = (24, 24, 20), GaussianKernel(sigma=1.2, support=8)
    n = 600
    Ls = [mm * 0.7 for mm in m]
    h = Ls[0] / m[0]
    b = box(Ls, dtype=jnp.float64)
    pos0 = jnp.asarray((rng.random((n, 3)) - 0.5) * np.asarray(Ls))
    bins = bin_pencils(pos0, m, b)
    # drift strictly less than slack*h in x/y (z drift unconstrained)
    drift = jnp.asarray(rng.uniform(-0.99, 0.99, size=(n, 3)))
    drift = drift * jnp.asarray([h, h, 3.0 * h])
    pos1 = pos0 + drift   # may leave the primary box: wrap handled inside
    q = jnp.asarray(rng.normal(size=(n, 3)))
    f_ref = spread(kern, pos1, q, m, b)
    f_p, ovf = spread_pencil(kern, pos1, q, m, b, bins, slack=1)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref), atol=1e-12)
    u = jnp.asarray(rng.normal(size=m + (3,)))
    v_ref = interpolate(kern, pos1, u, b)
    v_p, _ = interpolate_pencil(kern, pos1, u, b, bins, slack=1)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref), atol=1e-12)


def test_quasi2d_pencil_matches_direct(monkeypatch):
    """quasi2d's 2D spread/interp ride the pencil path (degenerate nz=1,
    unit z-weights) at large N; force the dispatch at small N and check
    exact agreement with the direct 2D scatter."""
    import uammd_tpu.integrators.bdhi.quasi2d as q2d

    rng = np.random.default_rng(3)
    N, L = 300, 32.0
    pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (N, 3)))
    vals = jnp.asarray(rng.normal(size=(N, 2)))
    shape, sigma, support = (64, 64), 0.8, 10

    f_direct = q2d._spread2d(pos, vals, shape, (L, L), sigma, support)
    g_direct = q2d._interp2d(pos, f_direct, (L, L), sigma, support)

    orig_ctx = q2d._pencil2d_ctx

    def forced(p, sh, Ls, sg, sp):
        # bypass only the N >= 4096 gate; keep the geometry checks
        big = jnp.zeros((5000, 3), p.dtype)
        if orig_ctx(big, sh, Ls, sg, sp) is None:
            return None
        from uammd_tpu.solvers.ibm import GaussianKernel
        from uammd_tpu.solvers.pencil_ibm import bin_pencils

        nx, ny = sh
        hx = Ls[0] / nx
        kern = GaussianKernel(sigma=sg / hx, support=sp)
        b = box([float(Ls[0]), float(Ls[1]), 1.0], dtype=p.dtype)
        pos3 = jnp.concatenate([p[:, :2], jnp.zeros_like(p[:, :1])], -1)
        return kern, b, pos3, bin_pencils(pos3, (nx, ny, 1), b)

    monkeypatch.setattr(q2d, "_pencil2d_ctx", forced)
    f_pencil = q2d._spread2d(pos, vals, shape, (L, L), sigma, support)
    g_pencil = q2d._interp2d(pos, f_pencil, (L, L), sigma, support)
    np.testing.assert_allclose(
        np.asarray(f_pencil), np.asarray(f_direct), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g_pencil), np.asarray(g_direct), atol=1e-12
    )


def test_fused_pencil_matches_xla_path():
    """The Pallas-fused spread/interp (the TPU production far path,
    solvers/pencil_ibm.spread_pencil_fused) must match the XLA einsum
    path to float round-off, with and without persistent-bin slack."""
    import numpy as np

    from uammd_tpu.core.box import box
    from uammd_tpu.solvers.ibm import GaussianKernel
    from uammd_tpu.solvers.pencil_ibm import (
        bin_pencils,
        interpolate_pencil,
        interpolate_pencil_fused,
        spread_pencil,
        spread_pencil_fused,
    )

    rng = np.random.default_rng(0)
    n, L, shape = 5000, 24.0, (32, 32, 32)
    b = box(L)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    vals = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    kern = GaussianKernel(sigma=1.1, support=8)
    bins = bin_pencils(pos, shape, b)
    for slack in (0, 1):
        f0, _ = spread_pencil(kern, pos, vals, shape, b, bins, slack=slack)
        f1, _ = spread_pencil_fused(kern, pos, vals, shape, b, bins,
                                    slack=slack)
        s = float(jnp.max(jnp.abs(f0)))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   atol=2e-6 * s, rtol=0)
        v0, _ = interpolate_pencil(kern, pos, f0, b, bins, slack=slack)
        v1, _ = interpolate_pencil_fused(kern, pos, f0, b, bins,
                                         slack=slack)
        sv = float(jnp.max(jnp.abs(v0)))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   atol=2e-6 * sv, rtol=0)
