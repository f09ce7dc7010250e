"""Component timing for the PSEGrid EM step at 128k (find the 33s culprit)."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from uammd_tpu.core.box import box
from uammd_tpu.engine.layout import pack_channels, unpack_values
from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


def main():
    n = int(os.environ.get("PSE_N", 131072))
    xi = float(os.environ.get("PSE_XI", 0.3))
    phi, radius = 0.05, 1.0
    L = (n * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    far_grid = os.environ.get("PSE_FAR")
    lz = int(os.environ.get("PSE_LANCZOS", 12))
    n_strag = int(os.environ.get("PSE_STRAG", 0))
    be = PSEGrid.create(
        b, n, viscosity=1.0, radius=radius,
        xi=None if far_grid else xi,
        far_grid=int(far_grid) if far_grid else None,
        tolerance=1e-4, lanczos_iterations=lz, pos=pos, n_strag=n_strag,
    )
    print(f"spec={be.spec.shape} cap={be.spec.cap} nlane={be.spec.nlane} "
          f"S={be.spec.n_strag} far={be.far.shape} rcut={be.rcut:.2f}",
          flush=True)

    pack_j = jax.jit(lambda p, f: pack_channels(be.spec, p, f))
    cg = timeit("pack_channels", pack_j, pos, F)
    if n_strag:
        print(f"  stragglers in flight: {int(jnp.sum(cg.spid >= 0))}",
              flush=True)
        mv = jax.jit(
            lambda c: be.near_matvec_slots(c, *c.channels, sf3=c.schannels)
        )
    else:
        mv = jax.jit(lambda c: be.near_matvec_slots(c, *c.channels))
    timeit("near matvec (1x)", mv, cg)

    noise = jax.jit(lambda c, k: be._near_noise_slots(c, k)[0])
    timeit(f"near noise (Lanczos {lz})", noise, cg, jax.random.key(1))
    resj = jax.jit(lambda c, k: be._near_noise_slots(c, k)[-1])
    print(f"  lanczos residual @ {lz} iters: "
          f"{float(jax.device_get(resj(cg, jax.random.key(1)))):.2e}",
          flush=True)

    far_mf = jax.jit(lambda p, f: be.far.compute_mf(p, f))
    timeit("far compute_mf", far_mf, pos, F)

    # far-field internals
    from uammd_tpu.solvers.ibm import interpolate_auto, spread_auto
    kern = be.far._kernel(jnp.float32)
    sp = jax.jit(lambda p, f: spread_auto(kern, p, f, be.far.shape, b))
    field = timeit("far spread", sp, pos, F)
    try:
        fftj = jax.jit(lambda g: jnp.fft.rfftn(g, axes=(0, 1, 2)))
        fk = timeit("far fft fwd (3 comp)", fftj, field)
        iff = jax.jit(
            lambda k: jnp.fft.irfftn(k, s=tuple(be.far.shape), axes=(0, 1, 2))
        )
        timeit("far fft inv (3 comp)", iff, fk)
    except Exception as e:  # standalone batched rfftn can hit TPU
        print(f"  (standalone fft timing unavailable: {type(e).__name__})",
              flush=True)
    itp = jax.jit(lambda p, g: interpolate_auto(kern, p, g, b))
    timeit("far interp", itp, pos, field)

    far_fused = jax.jit(
        lambda p, f, k: be.far.compute_mf_bdw(p, f, k, 1.0)
    )
    timeit("far compute_mf_bdw", far_fused, pos, F, jax.random.key(2))

    unp = jax.jit(lambda c: unpack_values(c, (c.x, c.y, c.z)))
    timeit("unpack_values", unp, cg)

    disp = jax.jit(
        lambda p, f, k: be.displacement(p, f, k, 0.01, 1.0)[0]
    )
    timeit("full displacement", disp, pos, F, jax.random.key(3))


if __name__ == "__main__":
    main()
