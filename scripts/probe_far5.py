"""Round-5 far-field pencil spread/interp probe: chunk sweep on the real
chip at the bench config (144^3, support 8, slack 1, N=131k). Each timed
inside an honest scan with carry feedback. Env: PROBE_FAR5_CHUNKS
(default "64,108,162,324"), PROBE_PSE_N, PROBE_PSE_ITERS."""

from __future__ import annotations

import json
import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = int(os.environ.get("PROBE_PSE_N", 131072))
ITERS = int(os.environ.get("PROBE_PSE_ITERS", 10))


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(fn, x0, label, iters=ITERS):
    run = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (fn(c), None), x, None, length=iters)[0])
    out = run(x0)
    sync(out)
    t0 = time.perf_counter()
    out = run(x0)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"component": label, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    from uammd_tpu.core.box import box
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers.pencil_ibm import (
        interpolate_pencil,
        spread_pencil,
    )
    from uammd_tpu.utils.lattices import lattice

    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    pos = jnp.asarray(lattice(N, L, "fcc"), jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius, far_grid=144,
        tolerance=1e-4, lanczos_iterations=4, pos=pos, n_strag=192,
    )
    far = be.far
    bins = far.pencil_bins(pos, slack=be.far_slack)
    kern = far._kernel(jnp.float32)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    shape = far.shape
    print(json.dumps({
        "shape": shape, "support": kern.support,
        "cap": int(bins.pids.shape[1]), "npen": int(bins.pids.shape[0]),
        "slack": be.far_slack,
    }), flush=True)

    chunks = [int(c) for c in os.environ.get(
        "PROBE_FAR5_CHUNKS", "64,108,162,324").split(",")]
    for chunk in chunks:
        def sp_body(x, chunk=chunk):
            p, v = x
            f, ovf = spread_pencil(kern, p, v, shape, far.box, bins,
                                   slack=be.far_slack, chunk=chunk)
            return (p + 1e-20 * f[0, 0, 0, 0], v)

        ms_s = timed(sp_body, (pos, vals), f"spread_chunk{chunk}")

        field, _ = jax.jit(
            lambda p, v, chunk=chunk: spread_pencil(
                kern, p, v, shape, far.box, bins,
                slack=be.far_slack, chunk=chunk)
        )(pos, vals)

        def it_body(x, chunk=chunk):
            p, f = x
            v, ovf = interpolate_pencil(kern, p, f, far.box, bins,
                                        slack=be.far_slack, chunk=chunk)
            return (p + 1e-20 * v[0, 0], f)

        timed(it_body, (pos, field), f"interp_chunk{chunk}")



def fused():
    from uammd_tpu.core.box import box
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers.pencil_ibm import (
        interpolate_pencil_fused,
        spread_pencil_fused,
    )
    from uammd_tpu.utils.lattices import lattice

    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    pos = jnp.asarray(lattice(N, L, "fcc"), jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius, far_grid=144,
        tolerance=1e-4, lanczos_iterations=4, pos=pos, n_strag=192,
    )
    far = be.far
    bins = far.pencil_bins(pos, slack=be.far_slack)
    kern = far._kernel(jnp.float32)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    shape = far.shape

    def sp_body(x):
        p, v = x
        f, ovf = spread_pencil_fused(kern, p, v, shape, far.box, bins,
                                     slack=be.far_slack)
        return (p + 1e-20 * f[0, 0, 0, 0], v)

    timed(sp_body, (pos, vals), "spread_fused")

    field, _ = jax.jit(
        lambda p, v: spread_pencil_fused(
            kern, p, v, shape, far.box, bins, slack=be.far_slack)
    )(pos, vals)

    def it_body(x):
        p, f = x
        v, ovf = interpolate_pencil_fused(kern, p, f, far.box, bins,
                                          slack=be.far_slack)
        return (p + 1e-20 * v[0, 0], f)

    timed(it_body, (pos, field), "interp_fused")




def decompose():
    """Split the fused spread into (pallas contraction) vs (fold+transpose)
    and try the transposed-dot variant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from uammd_tpu.core.box import box
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.solvers.pencil_ibm import (
        PENCIL, _fold, _halo, _node_coords,
    )
    from uammd_tpu.utils.lattices import lattice

    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    pos = jnp.asarray(lattice(N, L, "fcc"), jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius, far_grid=144,
        tolerance=1e-4, lanczos_iterations=4, pos=pos, n_strag=192,
    )
    far = be.far
    bins = far.pencil_bins(pos, slack=be.far_slack)
    kern = far._kernel(jnp.float32)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    shape = far.shape
    C = 3
    halo = _halo(kern.support) + be.far_slack
    P = PENCIL + 2 * halo
    npx, npy = shape[0] // PENCIL, shape[1] // PENCIL
    npen = npx * npy
    nz = shape[2]
    cap = bins.pids.shape[1]
    Pf2, NQ = P * P, nz * C
    nxf, nyf, nzf = (np.float32(s) for s in shape)

    u = _node_coords(pos, shape, b).astype(jnp.float32)
    mask = bins.pids > 0
    src = jnp.maximum(bins.pids - 1, 0)
    pu0 = jnp.transpose(u[src], (0, 2, 1))
    pv0 = jnp.transpose(jnp.where(mask[..., None], vals[src], 0), (0, 2, 1))

    def make_call(swap):
        def kern_body(pu_ref, pv_ref, out_ref):
            pid = pl.program_id(0)
            ox = ((pid // npy) * PENCIL - halo).astype(jnp.float32)
            oy = ((pid % npy) * PENCIL - halo).astype(jnp.float32)
            ux = pu_ref[0, 0, :][:, None]
            uy = pu_ref[0, 1, :][:, None]
            uz = pu_ref[0, 2, :][:, None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (cap, Pf2), 1)
            jx = (lane // P).astype(jnp.float32)
            jy = (lane - (lane // P) * P).astype(jnp.float32)
            dx = ox + jx - ux
            dy = oy + jy - uy
            dx = dx - nxf * jnp.round(dx / nxf)
            dy = dy - nyf * jnp.round(dy / nyf)
            wxy = kern.phi(dx) * kern.phi(dy)
            laneq = jax.lax.broadcasted_iota(jnp.int32, (cap, NQ), 1)
            zq = (laneq // C).astype(jnp.float32)
            cq = laneq - (laneq // C) * C
            dz = zq - uz
            dz = dz - nzf * jnp.round(dz / nzf)
            wz = kern.phi(dz)
            q = jnp.zeros((cap, NQ), jnp.float32)
            for c in range(C):
                vc = pv_ref[0, c, :][:, None]
                q = q + jnp.where(cq == c, wz * vc, 0.0)
            if swap:
                # [NQ, Pf2] output: contraction with q as LHS
                out_ref[0, :, :] = jax.lax.dot_general(
                    q, wxy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                out_ref[0, :, :] = jax.lax.dot_general(
                    wxy, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        oshape = (npen, NQ, Pf2) if swap else (npen, Pf2, NQ)
        return pl.pallas_call(
            kern_body,
            grid=(npen,),
            in_specs=[
                pl.BlockSpec((1, 3, cap), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, cap), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1,) + oshape[1:], lambda p: (p, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        )

    callA = make_call(False)
    callB = make_call(True)

    def bodyA(x):
        pu, pv = x
        patch = callA(pu, pv)
        return (pu + 1e-20 * patch[0, 0, 0], pv)

    timed(bodyA, (pu0, pv0), "pallas_contract_only")

    def bodyB(x):
        pu, pv = x
        patch = callB(pu, pv)
        return (pu + 1e-20 * patch[0, 0, 0], pv)

    timed(bodyB, (pu0, pv0), "pallas_contract_swapped")

    patch0 = callA(pu0, pv0)

    def bodyF(x):
        patch = x
        pr = patch.reshape(npx, npy, P, P, nz, C)
        pr = _fold(pr, halo, axis_p=0, axis_j=2)
        pr = _fold(pr, halo, axis_p=1, axis_j=3)
        field = pr.transpose(0, 2, 1, 3, 4, 5).reshape(
            npx * PENCIL, npy * PENCIL, nz, C)
        return patch + 1e-20 * field[0, 0, 0, 0]

    timed(bodyF, patch0, "fold_transpose_only")

    def bodyG(x):
        pu, pv = x
        g = jnp.transpose(u[src], (0, 2, 1))
        g2 = jnp.transpose(jnp.where(mask[..., None], vals[src], 0),
                           (0, 2, 1))
        return (pu + 1e-20 * g[0, 0, 0] + 1e-20 * g2[0, 0, 0], pv)

    timed(bodyG, (pu0, pv0), "gather_transpose_only")


if __name__ == "__main__":
    if os.environ.get("PROBE_FAR5_DECOMP"):
        decompose()
    elif os.environ.get("PROBE_FAR5_FUSED"):
        fused()
    else:
        main()
