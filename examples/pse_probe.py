"""Perf probe: BDHI-PSE EM step at N=131072 (phi=5% colloid suspension).

The driver's second metric (BASELINE.json: "BDHI-PSE: 128k colloid
suspension, Ewald-split spectral mobility + Lanczos noise"). Times the fused
PSEGrid.displacement (near matvec + slot-space Lanczos noise + fused far
spectral pass) under a scan, for one or more Ewald splitting parameters xi —
the near/far balance knob (reference: src/Integrator/BDHI/PSE/BDHI_PSE.cuh
psi parameter).

Run on the real TPU:  python examples/pse_probe.py
Env: PSE_N, PSE_XI (comma list), PSE_STEPS, PSE_LANCZOS.
"""

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
from uammd_tpu.integrators.bdhi.pse_engine import PSEGrid


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def probe(n, xi, steps, lanczos_iterations, phi=0.05, radius=1.0,
          n_strag=0):
    L = (n * (4.0 / 3.0) * math.pi * radius**3 / phi) ** (1.0 / 3.0)
    b = box(L)
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.random((n, 3)) - 0.5) * L, jnp.float32)

    t0 = time.perf_counter()
    be = PSEGrid.create(
        b, n, viscosity=1.0, radius=radius, xi=xi, tolerance=1e-4,
        lanczos_iterations=lanczos_iterations, pos=pos, n_strag=n_strag,
    )
    print(
        f"xi={xi}: rcut={be.rcut:.2f} spec={be.spec.shape} cap={be.spec.cap} "
        f"fold={be.spec.fold} nlane={be.spec.nlane} S={be.spec.n_strag} "
        f"far_grid={be.far.shape}",
        flush=True,
    )

    dt, temperature = 0.01, 1.0

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(pos, key, nsteps):
        def body(carry, _):
            p, k = carry
            k, sub = jax.random.split(k)
            # soft repulsive force stand-in (cheap; the metric is mobility)
            f = 0.01 * jnp.sin(p)
            dx, ovf = be.displacement(p, f, sub, dt, temperature)
            return (p + dx, k), ovf
        (p, k), ovf = jax.lax.scan(body, (pos, key), None, length=nsteps)
        return p, jnp.any(ovf)

    key = jax.random.key(0)
    p, ovf = run(pos, key, steps)  # warmup at the SAME static length
    sync(p)
    print(f"  compile+warmup: {time.perf_counter()-t0:.0f}s "
          f"(overflow={bool(jax.device_get(ovf))})", flush=True)

    t0 = time.perf_counter()
    p, ovf = run(p, jax.random.fold_in(key, 1), steps)
    sync(p)
    dt_s = (time.perf_counter() - t0) / steps
    print(
        f"  EM step: {dt_s*1e3:.1f} ms -> {n/dt_s:.3e} particle-steps/s "
        f"(overflow={bool(jax.device_get(ovf))})",
        flush=True,
    )
    return n / dt_s


if __name__ == "__main__":
    n = int(os.environ.get("PSE_N", 131072))
    steps = int(os.environ.get("PSE_STEPS", 5))
    lz = int(os.environ.get("PSE_LANCZOS", 12))
    n_strag = int(os.environ.get("PSE_STRAG", 0))
    xis = [float(s) for s in os.environ.get("PSE_XI", "0.25").split(",")]
    for xi in xis:
        probe(n, xi, steps, lz, n_strag=n_strag)
