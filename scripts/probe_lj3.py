"""K1 structural variants probe (round 3): what actually limits the pair
kernel — radial ops, reaction write-back, or the candidate-slot volume?

Variants (raw kernel, carry-feedback scans, idle host):
  base      - production Newton kernel (fused LJ radial)
  selfhalf  - circulant Newton-halved self block (cap^2/2 self slots)
  noreact   - reaction write-back skipped (timing floor; wrong physics)
  triv      - trivial radial g = c * select(r2) (structural floor)
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


def main():
    from uammd_tpu.engine.kernel2 import (
        broadcast_stragglers,
        make_newton_pair_kernel,
    )
    from uammd_tpu.engine.layout import unpack
    from uammd_tpu.engine.md import lj_g_fused, make_lj_md
    from uammd_tpu.engine.md2 import make_lj_md2
    from uammd_tpu.utils.lattices import lattice

    which = sys.argv[1:] or ["base", "selfhalf", "noreact", "triv"]
    pos = lattice(N, L, "fcc")
    md_melt = make_lj_md(L, N, dt=0.004, temperature=TEMP, pos=pos)
    gs = md_melt.init(pos, seed=0)
    for _ in range(3):
        gs = md_melt.run(gs, 100)
    sync(gs.x)
    mp = np.asarray(jax.device_get(unpack(gs)[0]))
    print("# melt done", flush=True)

    md2 = make_lj_md2(L, N, dt=0.01, temperature=TEMP, pos=mp,
                      n_strag=8, fast_recip=True)
    gs2 = md2.init(mp, seed=1)
    spec = md2.spec
    strag = broadcast_stragglers(spec, gs2.spos, gs2.spid)
    g_fast = lj_g_fused(rc2=2.5 * 2.5, approx=True)

    def triv_g(r2):
        t = jnp.where((r2 < np.float32(6.25)) & (r2 > np.float32(4e-3)),
                      r2, np.float32(0.0))
        return np.float32(1e-30) * t
    triv_g.fused = True

    eps = np.float32(1e-30)

    def timed(kern, label):
        def body(c, _):
            x, y, z = c
            outs = kern(x, y, z, strag)
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

    from uammd_tpu.engine.kernel2 import fold_reactions_jnp

    def forces_by_pid(kern, x, y, z, sblock, pid):
        outs = kern(x, y, z, sblock)
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

    base_kern = make_newton_pair_kernel(spec, g_fast)
    f_base = v_base = None
    if "check" in which:
        f_base, v_base = forces_by_pid(base_kern, gs2.x, gs2.y, gs2.z,
                                       strag, gs2.pid)
        print("# base |f| mean", float(np.abs(f_base).mean()), flush=True)

    if "base" in which:
        timed(base_kern, "base")
    if "selfhalf" in which:
        kern_sh = make_newton_pair_kernel(spec, g_fast, self_half=True)
        if f_base is not None:
            f_sh, v_sh = forces_by_pid(kern_sh, gs2.x, gs2.y, gs2.z,
                                       strag, gs2.pid)
            m = v_base & v_sh
            err = np.abs(f_sh[m] - f_base[m]).max()
            print(json.dumps({"check": "selfhalf", "max_abs_diff": float(err)}),
                  flush=True)
        timed(kern_sh, "selfhalf")
    if "noreact" in which:
        timed(make_newton_pair_kernel(spec, g_fast,
                                      _timing_no_reaction=True), "noreact")
    if "triv" in which:
        timed(make_newton_pair_kernel(spec, triv_g), "triv")
    if "sumonly" in which:
        timed(make_newton_pair_kernel(spec, g_fast, _timing_mode="sumonly"),
              "sumonly")
    if "routeonly" in which:
        timed(make_newton_pair_kernel(spec, g_fast,
                                      _timing_mode="routeonly"), "routeonly")
    if "pad128" in which:
        # nlane = 32*4 = 128 exactly: lane rolls become native vreg
        # rotates (nlane=126 rolls are misaligned); costs 1.29x candidate
        # slots (cap 32 at occ 19.5) — probes whether alignment wins more
        import dataclasses as _dc

        from uammd_tpu.engine.layout import pack

        spec128 = _dc.replace(
            spec, shape=(32, 40, 42), cap=32, fold=4, n_strag=spec.n_strag
        )
        gsp = pack(spec128, jnp.asarray(mp, jnp.float32))
        strag128 = broadcast_stragglers(spec128, gsp.spos, gsp.spid)

        kern = make_newton_pair_kernel(spec128, g_fast)
        if f_base is not None:
            f_p, v_p = forces_by_pid(kern, gsp.x, gsp.y, gsp.z, strag128,
                                     gsp.pid)
            m = v_base & v_p
            err = np.abs(f_p[m] - f_base[m]).max()
            rel = err / max(np.abs(f_base).max(), 1e-30)
            print(json.dumps({"check": "pad128", "max_abs_diff": float(err),
                              "rel": float(rel)}), flush=True)

        def body(c, _):
            x, y, z = c
            outs = kern(x, y, z, strag128)
            return (x + eps * outs[0], y + eps * outs[1],
                    z + eps * outs[2]), None

        run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
        c0 = (gsp.x, gsp.y, gsp.z)
        c1 = run(c0)
        sync(c1[0])
        t0 = time.perf_counter()
        c1 = run(c1)
        sync(c1[0])
        print(json.dumps({
            "component": "pad128",
            "ms": (time.perf_counter() - t0) / ITERS * 1e3,
            "overflow": bool(jax.device_get(gsp.overflow)),
        }), flush=True)


if __name__ == "__main__":
    main()
