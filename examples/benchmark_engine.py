"""The reference benchmark (examples/misc/benchmark.cu) on the Pallas engine.

Run: python examples/benchmark_engine.py  (see also bench.py at the repo root)
"""
import sys, time
import jax
sys.path.insert(0, "..")
from uammd_tpu.engine.md import make_lj_md
from uammd_tpu.utils.lattices import lattice

n, L = 1 << 20, 128.0
pos = lattice(n, L, "fcc")
md_melt = make_lj_md(L, n, dt=0.004, temperature=1.5, pos=pos)
gs = md_melt.run(md_melt.init(pos, seed=0), 300)
from uammd_tpu.engine.layout import unpack
import numpy as np
p = np.asarray(jax.device_get(unpack(gs)[0]))
md = make_lj_md(L, n, dt=0.01, temperature=1.5, pos=p)
gs = md.run(md.init(p, seed=1), 100)
jax.device_get(gs.x.ravel()[0])
t0 = time.perf_counter()
gs = md.run(gs, 100)
jax.device_get(gs.x.ravel()[0])
dt = time.perf_counter() - t0
print(f"{n * 100 / dt:.3e} particle-steps/s")
