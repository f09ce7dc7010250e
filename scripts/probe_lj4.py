"""Round-4 LJ probe: op-shaving variants of the v2 Newton pair kernel plus
step-component times at the bench geometry (N = 2^20, box 128^3, melted).

Kernel variants (raw kernel scans, idle host):
  oldg      - round-3 production radial (10-op fused select-on-t form)
  base      - current lj_g_fused (9-op max-clamp form)
  selfhalf  - base + circulant Newton-halved self block
  ccstrag   - base + cell-center straggler wrap (no per-pair min-image)
  all3      - base + selfhalf + ccstrag
  nostrag   - base with NO straggler side input (broadcast cost floor)
Components:
  update    - fused fold+G-J update kernel alone (clt noise)
  rebin     - rebin_fast3 alone
  step      - full production md2 step (current defaults)
  step_all3 - full md2 step with self_half + strag_cellcenter
Pass variant names as argv; "check" adds force cross-validation vs oldg.
"""

from __future__ import annotations

import json
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

N = 1 << 20
L = 128.0
TEMP = 1.5
ITERS = 200


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def lj_g_fused_old(epsilon=1.0, sigma=1.0, *, rc2, clamp_lo=4e-3):
    """Round-3 production form: select-on-t with double compare."""
    from jax.experimental import pallas as pl

    s6 = float(sigma) ** 6
    c1 = np.float32(-48.0 * epsilon * s6 * s6)
    c2 = np.float32(24.0 * epsilon * s6)
    rc2_ = np.float32(rc2)
    lo_ = np.float32(clamp_lo)

    def g(r2):
        t = jnp.where((r2 < rc2_) & (r2 > lo_),
                      pl.reciprocal(r2, approx=True), np.float32(0.0))
        t2 = t * t
        t3 = t2 * t
        t4 = t2 * t2
        return t4 * (c1 * t3 + c2)

    g.fused = True
    return g


def main():
    from uammd_tpu.engine.kernel2 import (
        broadcast_stragglers,
        fold_reactions_jnp,
        make_newton_pair_kernel,
    )
    from uammd_tpu.engine.layout import pack, unpack
    from uammd_tpu.engine.md import lj_g_fused, make_lj_md
    from uammd_tpu.engine.md2 import make_lj_md2
    from uammd_tpu.utils.lattices import lattice

    which = sys.argv[1:] or ["oldg", "base", "selfhalf", "ccstrag", "all3",
                             "update", "rebin", "step", "step_all3"]
    pos = lattice(N, L, "fcc")
    md_melt = make_lj_md(L, N, dt=0.004, temperature=TEMP, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, 100)
    sync(gs.x)
    mp = np.asarray(jax.device_get(unpack(gs)[0]))
    print("# melt done", flush=True)

    md2 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                      n_strag=16, noise="clt", fast_recip=True)
    gs2 = md2.init(mp, seed=1)
    spec = md2.spec
    print(json.dumps({"spec": {"shape": spec.shape, "cap": spec.cap,
                               "fold": spec.fold, "n_strag": spec.n_strag}}),
          flush=True)
    strag = broadcast_stragglers(spec, gs2.spos, gs2.spid)
    g_new = lj_g_fused(rc2=2.5 * 2.5, approx=True)
    g_old = lj_g_fused_old(rc2=2.5 * 2.5)

    eps = np.float32(1e-30)

    def timed_kernel(kern, label, sblock=strag):
        def body(c, _):
            x, y, z = c
            outs = (kern(x, y, z, sblock) if sblock is not None
                    else kern(x, y, z))
            return (x + eps * outs[0], y + eps * outs[1],
                    z + eps * outs[2]), None

        run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
        c0 = (gs2.x, gs2.y, gs2.z)
        c1 = run(c0)
        sync(c1[0])
        t0 = time.perf_counter()
        c1 = run(c1)
        sync(c1[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({"component": label, "ms": ms}), flush=True)

    def forces_by_pid(kern, x, y, z, sblock, pid):
        outs = kern(x, y, z, sblock) if sblock is not None else kern(x, y, z)
        home = outs[0:3]
        groups = [outs[3 + 3 * i: 6 + 3 * i] for i in range(4)]
        fx, fy, fz = fold_reactions_jnp(home, groups)
        f = np.stack([np.asarray(jax.device_get(a)).ravel()
                      for a in (fx, fy, fz)], axis=-1)
        p = np.asarray(jax.device_get(pid)).ravel()
        sel = p >= 0
        out = np.zeros((N, 3), np.float64)
        valid = np.zeros((N,), bool)
        out[p[sel]] = f[sel]
        valid[p[sel]] = True
        return out, valid

    do_check = "check" in which
    f_ref = v_ref = None

    def maybe_check(kern, label, x=None, y=None, z=None, sblock=strag,
                    pid=None):
        nonlocal f_ref, v_ref
        if not do_check:
            return
        xx = gs2.x if x is None else x
        yy = gs2.y if y is None else y
        zz = gs2.z if z is None else z
        pp = gs2.pid if pid is None else pid
        f, v = forces_by_pid(kern, xx, yy, zz, sblock, pp)
        if f_ref is None:
            f_ref, v_ref = f, v
            print(json.dumps({"check": label, "ref": True,
                              "mean_abs_f": float(np.abs(f).mean())}),
                  flush=True)
        else:
            m = v_ref & v
            err = float(np.abs(f[m] - f_ref[m]).max())
            rel = err / max(float(np.abs(f_ref[m]).max()), 1e-30)
            print(json.dumps({"check": label, "max_abs_diff": err,
                              "rel": rel}), flush=True)

    variants = {
        "oldg": dict(g=g_old),
        "base": dict(g=g_new),
        "selfhalf": dict(g=g_new, self_half=True),
        "ccstrag": dict(g=g_new, strag_cellcenter=True),
        "all3": dict(g=g_new, self_half=True, strag_cellcenter=True),
    }
    for name in ["oldg", "base", "selfhalf", "ccstrag", "all3"]:
        if name not in which and not (do_check and name == "oldg"):
            continue
        kw = dict(variants[name])
        g = kw.pop("g")
        kern = make_newton_pair_kernel(spec, g, **kw)
        maybe_check(kern, name)
        if name in which:
            timed_kernel(kern, name)

    if "nostrag" in which:
        import dataclasses as _dc

        spec0 = _dc.replace(spec, n_strag=0)
        gs0 = pack(spec0, jnp.asarray(mp, jnp.float32))
        kern0 = make_newton_pair_kernel(spec0, g_new)

        def body(c, _):
            x, y, z = c
            outs = kern0(x, y, z)
            return (x + eps * outs[0], y + eps * outs[1],
                    z + eps * outs[2]), None

        run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
        c1 = run((gs0.x, gs0.y, gs0.z))
        sync(c1[0])
        t0 = time.perf_counter()
        c1 = run(c1)
        sync(c1[0])
        print(json.dumps({"component": "nostrag",
                          "ms": (time.perf_counter() - t0) / ITERS * 1e3,
                          "overflow": bool(jax.device_get(gs0.overflow))}),
              flush=True)

    if "update" in which:
        from uammd_tpu.engine.update_kernel import make_gj_fold_update_kernel

        upd = make_gj_fold_update_kernel(spec, 0.01, TEMP, 1.0, 1.0,
                                         noise="clt")
        zgrp = tuple(jnp.zeros_like(gs2.fx) for _ in range(12))

        def body(c, i):
            x, y, z, wx, wy, wz = c
            (x, y, z, wx, wy, wz), _ = upd(
                x, y, z, wx, wy, wz, gs2.fx, gs2.fy, gs2.fz, zgrp,
                gs2.ref_x, gs2.ref_y, gs2.ref_z, i,
            )
            return (x, y, z, wx, wy, wz), None

        run = jax.jit(lambda c: jax.lax.scan(
            body, c, jnp.arange(ITERS, dtype=jnp.int32))[0])
        c0 = (gs2.x, gs2.y, gs2.z, gs2.vx, gs2.vy, gs2.vz)
        c1 = run(c0)
        sync(c1[0])
        t0 = time.perf_counter()
        c1 = run(c1)
        sync(c1[0])
        print(json.dumps({"component": "update",
                          "ms": (time.perf_counter() - t0) / ITERS * 1e3}),
              flush=True)

    if "rebin" in which:
        from uammd_tpu.engine.rebin_kernel import rebin_fast3

        def body(g, _):
            return rebin_fast3(g), None

        run = jax.jit(lambda g: jax.lax.scan(body, g, None, length=20)[0])
        g1 = run(gs2)
        sync(g1.x)
        t0 = time.perf_counter()
        g1 = run(g1)
        sync(g1.x)
        print(json.dumps({"component": "rebin",
                          "ms": (time.perf_counter() - t0) / 20 * 1e3}),
              flush=True)

    def timed_step(md, label):
        g0 = md.init(mp, seed=1)
        g1 = md.run(g0, 100)
        sync(g1.x)
        t0 = time.perf_counter()
        g1 = md.run(g1, 100)
        g1 = md.run(g1, 100)
        sync(g1.x)
        ms = (time.perf_counter() - t0) / 200 * 1e3
        T = float(jax.device_get(md.temperature_of(g1)))
        print(json.dumps({
            "component": label, "ms": ms, "psteps": N / ms * 1e3,
            "vs_baseline": N / ms * 1e3 / 9.4e7, "T": T,
            "overflow": bool(jax.device_get(g1.overflow))}), flush=True)

    if "step" in which:
        timed_step(md2, "step")
    if "step_all3" in which:
        md3 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                          n_strag=16, noise="clt", fast_recip=True,
                          self_half=True, strag_cellcenter=True)
        timed_step(md3, "step_all3")


if __name__ == "__main__":
    main()
