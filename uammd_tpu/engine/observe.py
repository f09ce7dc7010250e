"""In-engine observables: energy / virial / stress at engine speed.

The reference computes force, energy, virial and stress through the same
transverser machinery at full speed (reference: src/Interactor/
Interactor.cuh:94-103 — note ``stress`` at :98 — and src/Interactor/
PairForces.cu:43-68). Here the v1 grid-resident Pallas kernel
(engine/pair_kernel.py) grows energy/virial/stress channels, so measuring
the pressure or energy of an N = 1M system costs one extra kernel pass
(~1.6x the force-only kernel) instead of falling back to the gathered
[N, K] neighbour path (~300x slower at 1M, round-1 measurement).

Usage: the state lives in a v2 engine (md2.GridMD2, straggler slots
possible); observables repack it into a straggler-free spec (CAP = max
occupancy) and run the 27-offset kernel with all channels on. The repack
costs two lax.sorts — irrelevant off the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layout import GridSpec, choose_spec, pack, unpack
from .pair_kernel import make_pair_force_kernel

_KERN_CACHE = {}


def observe_energy_virial_stress(
    gs,
    g_fn,
    e_fn,
    *,
    interpret: bool | None = None,
):
    """Per-particle (energy [N], virial [N], stress [N, 6]) in pid order.

    ``gs`` is a GridState from any engine spec (stragglers included —
    the state is repacked into an S = 0 spec sized to the actual max
    occupancy). g_fn/e_fn are the radial force/energy callbacks in the
    engine convention (g = (dE/dr)/r, e = pair energy).
    """
    spec = gs.spec
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pos, _, _ = unpack(gs)
    pos_h = np.asarray(jax.device_get(pos))
    spec0 = choose_spec(
        spec.box_size, gs.n, spec.cutoff, skin=spec.skin,
        pos=pos_h, n_strag=0,
    )
    key = (spec0, id(g_fn), id(e_fn), interpret)
    if key not in _KERN_CACHE:
        _KERN_CACHE[key] = make_pair_force_kernel(
            spec0, g_fn, e_fn, compute_virial=True, compute_stress=True,
            interpret=interpret,
        )
    kern = _KERN_CACHE[key]
    g0 = pack(spec0, pos)
    if bool(jax.device_get(g0.overflow)):  # pragma: no cover - safety
        raise RuntimeError("observable repack overflow: CAP undersized")
    outs = kern(g0.x, g0.y, g0.z)
    en, vir = outs[3], outs[4]
    stress = outs[5:11]
    # slot-space -> canonical pid order (sort, no gathers)
    valid = g0.pid >= 0
    pid = jnp.where(valid, g0.pid, gs.n).reshape(-1)
    cols = (pid, en.reshape(-1), vir.reshape(-1)) + tuple(
        s.reshape(-1) for s in stress
    )
    s = jax.lax.sort(cols, dimension=0, num_keys=1)
    n = gs.n
    return (
        s[1][:n],
        s[2][:n],
        jnp.stack([s[3 + c][:n] for c in range(6)], axis=-1),
    )


def lj_pressure(gs, *, epsilon=1.0, sigma=1.0, temperature=None,
                md=None, interpret=None):
    """Instantaneous LJ pressure of a grid-resident state:
    P = rho kT + sum_i virial_i / (3V), the reference test/MD EOS
    criterion's pressure estimator (reference: test/MD/test.bash,
    tools/lj_eos.cpp). Returns (P, total potential energy).
    ``temperature`` defaults to the kinetic temperature when ``md`` (the
    GridMD2) is given.
    """
    from .md import lj_e, lj_g

    g_fn = lj_g(epsilon, sigma)
    e_fn = lj_e(epsilon, sigma)
    en, vir, _ = observe_energy_virial_stress(gs, g_fn, e_fn,
                                              interpret=interpret)
    Ls = gs.spec.box_size
    V = float(Ls[0] * Ls[1] * Ls[2])
    rho = gs.n / V
    if temperature is None:
        assert md is not None, "need temperature or the engine for kinetic T"
        temperature = md.temperature_of(gs)
    # vir_i = sum_j -0.5 g r^2; with r_ij . f_ij = -g r^2 per pair and each
    # pair counted once per partner, sum_i vir_i = sum_pairs r_ij . f_ij,
    # so P = rho kT + sum_i vir_i / (3V)
    w = jnp.sum(vir)
    P = rho * temperature + w / (3.0 * V)
    return P, jnp.sum(en)
