"""Round-5 PSE persistent-path stage breakdown (bench config, real chip).

The round-3 probe (probe_pse.py) times the per-step-binned path; the bench
runs the PERSISTENT path (102 ms/step). This probe times that path's
actual stages, each inside an honest scan with carry feedback:

  refresh      - drift check + gathers (no-rebin steady state)
  pair_force   - WCA channel pass on the persistent pack
  near_mf_noise- fused 6-channel M F + first Lanczos matvec + 3 matvecs
  far_mf_bdw   - pencil spread + FFT x2 + fused k-noise + interp (bins
                 persistent)
  far_spread_p / far_interp_p - pencil spread / interp alone
  full         - displacement_with_pair_force_persistent

Env: PROBE_PSE_N (131072), PROBE_PSE_ITERS (10), BENCH_PSE_* as bench.py.
"""

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
    from uammd_tpu.engine.md import lj_g_fused
    from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid
    from uammd_tpu.utils.lattices import lattice

    phi, radius = 0.05, 1.0
    L = (N * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    pos = jnp.asarray(lattice(N, L, "fcc"), jnp.float32)
    be = PSEGrid.create(
        b, N, viscosity=1.0, radius=radius,
        far_grid=int(os.environ.get("BENCH_PSE_FAR", 144)),
        tolerance=1e-4, lanczos_iterations=10, pos=pos,
        n_strag=int(os.environ.get("BENCH_PSE_STRAG", 192)),
        near_skin=float(os.environ.get("BENCH_PSE_SKIN", "1.0")),
    )
    be = be.tuned_lanczos(pos, tol=float(os.environ.get("BENCH_PSE_LTOL",
                                                        1e-3)))
    print(json.dumps({
        "n": N, "far_grid": be.far.shape, "near_shape": be.spec.shape,
        "cap": be.spec.cap, "nlane": be.spec.nlane,
        "n_strag": be.spec.n_strag, "lanczos_m": be.lanczos_iterations,
        "far_slack": be.far_slack,
    }), flush=True)
    dt, temperature = 0.01, 1.0
    amp = math.sqrt(2.0 * temperature / dt)
    sigma = 2.0 * radius
    rc = 2.0 ** (1.0 / 6.0) * sigma
    force_slots = be.make_pair_force_slots(
        lj_g_fused(1.0, sigma, rc2=rc * rc, approx=True)
    )

    # melt a few steps so the pack is liquid-like, stay in no-rebin state
    st0 = jax.jit(be.em_state)(pos)
    key = jax.random.key(0)

    @jax.jit
    def one(p, st, k):
        k, sub = jax.random.split(k)
        dx, _f, st = be.displacement_with_pair_force_persistent(
            force_slots, p, sub, dt, temperature, st
        )
        return b.wrap_position(p + dx), st, k

    p, st, k = pos, st0, key
    for _ in range(5):
        p, st, k = one(p, st, k)
    sync(p)
    # refresh against the CURRENT positions so the steady no-rebin path is
    # what gets timed below
    cg0, bins0, st = jax.jit(lambda s, pp: be._refresh(s, pp))(st, p)
    print(json.dumps({"melted": True,
                      "ovf": bool(jax.device_get(st.overflow))}), flush=True)

    # ---- stage: refresh (no rebin)
    def refresh_body(x):
        pp, s = x
        cg, bins, s2 = be._refresh(s, pp)
        return (pp + 1e-12 * cg.x[0, 0, 0, 0], s2)

    timed(refresh_body, (p, st), "refresh")

    cg, bins, _ = jax.jit(lambda s, pp: be._refresh(s, pp))(st, p)

    # ---- stage: pair force
    def pair_body(x):
        cg_ = x
        (fx, fy, fz), sf3 = force_slots(cg_)
        return cg_.replace(x=cg_.x + 1e-20 * fx)

    timed(pair_body, cg, "pair_force")

    (fx0, fy0, fz0), sf30 = jax.jit(force_slots)(cg)

    # ---- stage: fused near M F + noise (1 six-channel + 3 matvecs)
    def nmf_body(x):
        fx, fy, fz = x
        (vx, vy, vz), sv3, b3, b3s, _res = be._near_mf_and_noise(
            cg, fx, fy, fz, sf30, jax.random.key(3)
        )
        return (fx + 1e-20 * vx + 1e-20 * b3[0], fy, fz)

    timed(nmf_body, (fx0, fy0, fz0), "near_mf_noise")

    from uammd_tpu.engine.layout import unpack_values

    forces0 = jax.jit(
        lambda cg_, f3, s3: unpack_values(cg_, f3, svalues=s3)
    )(cg, (fx0, fy0, fz0), sf30)

    # ---- stage: far M F + fused noise on persistent pencil bins
    def far_body(x):
        pp, f = x
        v = be.far.compute_mf_bdw(
            pp, f, jax.random.key(5), amp, bins=bins, slack=be.far_slack
        )
        return (pp + 1e-20 * v, f)

    timed(far_body, (p, forces0.astype(jnp.float32)), "far_mf_bdw")

    def far_mf_only(x):
        pp, f = x
        v = be.far.compute_mf(pp, f, bins=bins, slack=be.far_slack)
        return (pp + 1e-20 * v, f)

    timed(far_mf_only, (p, forces0.astype(jnp.float32)), "far_mf_only")

    # ---- full persistent step
    def full_body(x):
        pp, s, kk = x
        return one(pp, s, kk)

    timed(full_body, (p, st, k), "full_persistent")


if __name__ == "__main__":
    main()
