"""SPH dam break, with PNG snapshots.

Mirrors reference misc/dambreak.cu (SPH column collapsing under gravity)
and the PNG-output role of misc/logo.cu / LBM.cu: a block of SPH fluid
confined by 9-3 LJ walls spreads along the floor; x-z density histograms
are written as PNGs via the dependency-free writer in utils/export.
"""

import dataclasses
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from uammd_tpu import Computables, box, make_state
from uammd_tpu.integrators.base import run
from uammd_tpu.integrators.verlet import nve
from uammd_tpu.interactors.external import external_forces, wall_lj93
from uammd_tpu.interactors.sph import SPHParams, make_sph_force_fn
from uammd_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    ensure_capacity,
)
from uammd_tpu.utils.export import save_png, to_image

L = 20.0
b = box(L)
# a dense block in the left-bottom corner (the "dam")
nx, ny, nz = 10, 6, 12
g = np.stack(np.meshgrid(
    np.linspace(-L / 2 + 1.0, -L / 2 + 1.0 + (nx - 1) * 0.8, nx),
    np.linspace(-2.4, 2.4, ny),
    np.linspace(-L / 2 + 1.0, -L / 2 + 1.0 + (nz - 1) * 0.8, nz),
    indexing="ij"), -1).reshape(-1, 3)
n = g.shape[0]
st = make_state(jnp.asarray(g, jnp.float32), seed=0)
print(n, "SPH particles")

sph = SPHParams(support=1.0, viscosity=20.0, gas_stiffness=15.0,
                rest_density=1.2)
sph_force = make_sph_force_fn(sph)
floor_e, _ = wall_lj93(z0=-L / 2, epsilon=1.0, sigma=0.8, side=+1)


def energy_fn(pos, state):
    return floor_e(pos, state)


def force_fn(state, nbrs):
    fev, nbrs = sph_force(state, nbrs)
    wall = external_forces(state, energy_fn=energy_fn,
                           computables=Computables(force=True))
    grav = jnp.zeros_like(state.pos).at[:, 2].set(-1.0)
    return dataclasses.replace(fev, force=fev.force + wall.force + grav), nbrs


nl = ensure_capacity(
    build_neighbor_list(st.pos, b, sph.max_cutoff, skin_multiplier=1.3),
    st.pos)

outdir = tempfile.mkdtemp()
integ = nve(force_fn, dt=0.004)
widths = []
for frame in range(4):
    st, nl, _ = run(integ, st, nl, 150, initialize=(frame == 0))
    assert not bool(nl.overflow)
    x = np.asarray(st.pos)
    hist, _, _ = np.histogram2d(x[:, 2], x[:, 0], bins=48,
                                range=[[-L / 2, L / 2], [-L / 2, L / 2]])
    png = os.path.join(outdir, f"dambreak_{frame}.png")
    save_png(png, to_image(hist[::-1]))
    widths.append(float(x[:, 0].max() - x[:, 0].min()))
    print(f"frame {frame}: x-extent {widths[-1]:.2f}  -> {png}")

assert all(np.isfinite(widths)) and widths[-1] > widths[0] * 1.2, (
    "the dam should spread along the floor")
print("OK: dam break spread, PNGs written to", outdir)
