"""Equilibrium (Gibbs) measure test for the ICM thermal drift term.

VERDICT r3 item 6: the kT dS/dq RFD forcing exists precisely to make the
sampled stationary distribution match exp(-U/kT) (reference:
src/Integrator/Hydro/ICM.cu:1068). This test runs tracers under
icm_integrator with a confining potential and asserts

1. WITH the drift term the stationary density matches the Gibbs measure
   (harmonic-well variance) and the sub-grid phase density is uniform;
2. WITHOUT it, the sub-grid phase density acquires a measurably larger
   grid-scale modulation (the spurious drift pushes tracers toward
   sub-grid positions of extremal coupling) — i.e. the test FAILS when
   the term is disabled.

A deliberately narrow Gaussian spreading kernel (sigma = 0.45 h) is used:
its poor translation invariance amplifies the bias the drift term must
cancel, keeping the statistical budget of a CI test honest. (The
production Peskin kernels are designed to minimize exactly this
variation, which is why a drift-off run with them would need hours of
sampling to resolve the bias.)
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uammd_tpu.core.box import box
from uammd_tpu.core.state import make_state
from uammd_tpu.core.types import ForceEnergyVirial
from uammd_tpu.integrators.hydro.icm import ICM, icm_integrator
from uammd_tpu.solvers.ibm import GaussianKernel

L, CELLS = 8.0, 8
KT = 1.0
KSPRING = 1.0  # U = 0.5 k x^2 -> <x^2> = kT/k
DT = 0.05
M = 512
BURN, SAMPLE = 400, 2400
NBINS = 8
SIGMA = 0.45  # kernel width / h: sub-grid mobility modulation ~ 2 e^{-pi^2 s^2}


def _run(thermal_drift: bool, seed: int = 7):
    b = box(L)
    icm = ICM.create(b, CELLS, viscosity=1.0, density=1.0,
                     temperature=KT, dt=DT, include_advection=False)
    icm = dataclasses.replace(icm, kernel=GaussianKernel(sigma=SIGMA, support=4))

    def force_fn(state, aux):
        f = jnp.zeros_like(state.pos)
        f = f.at[:, 0].set(-KSPRING * state.pos[:, 0])
        return ForceEnergyVirial(force=f), aux

    integ = icm_integrator(force_fn, icm, thermal_drift=thermal_drift)

    rng = np.random.default_rng(seed)
    pos0 = np.zeros((M, 3))
    pos0[:, 0] = rng.normal(scale=np.sqrt(KT / KSPRING), size=M)
    pos0[:, 1:] = (rng.random((M, 2)) - 0.5) * L
    st = make_state(pos0, seed=seed, dtype=jnp.float64)
    st, aux = integ.init(st, None)

    h = L / CELLS

    @partial(jax.jit, static_argnums=2)
    def run_chunk(st, aux, nsteps):
        def body(carry, _):
            st, aux = carry
            st, aux = integ.step(st, aux)
            # per-step accumulators: sub-grid phase histogram (y, z — the
            # unconfined axes) and the confined-axis second moment
            phase = jnp.floor(
                jnp.mod(st.pos[:, 1:] / h, 1.0) * NBINS
            ).astype(jnp.int32).reshape(-1)
            hist = jnp.zeros((NBINS,), jnp.float64).at[phase].add(1.0)
            return (st, aux), (hist, jnp.sum(st.pos[:, 0] ** 2))

        (st, aux), (hists, x2) = jax.lax.scan(
            body, (st, aux), None, length=nsteps)
        return st, aux, jnp.sum(hists, axis=0), jnp.sum(x2)

    st, aux, _, _ = run_chunk(st, aux, BURN)
    st, aux, hist, x2sum = run_chunk(st, aux, SAMPLE)
    hist = np.asarray(jax.device_get(hist))
    x2 = float(jax.device_get(x2sum)) / (SAMPLE * M)
    mod = float(np.abs(hist / hist.mean() - 1.0).max())
    return x2, mod


@pytest.mark.slow
def test_icm_drift_fixes_gibbs_measure():
    x2_on, mod_on = _run(thermal_drift=True)
    x2_off, mod_off = _run(thermal_drift=False)
    print(f"\nicm_gibbs: x2_on={x2_on:.4f} mod_on={mod_on:.4f} "
          f"x2_off={x2_off:.4f} mod_off={mod_off:.4f}")

    # Gibbs variance in the confining direction (drift ON)
    assert abs(x2_on - KT / KSPRING) < 0.15 * KT / KSPRING, (x2_on,)
    # sub-grid phase density uniform with the drift term...
    assert mod_on < 0.06, (mod_on,)
    # ...and measurably modulated without it: disabling the term breaks
    # the equilibrium measure (this is the reference's reason the term
    # exists, ICM.cu:1068)
    assert mod_off > max(2.5 * mod_on, 0.05), (mod_on, mod_off)
