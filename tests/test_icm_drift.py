"""ICM kT dS/dq thermal drift (reference: src/Integrator/Hydro/ICM.cu:1068).

The RFD estimator (kT/delta)[S(q + delta w/2) - S(q - delta w/2)] w has
expectation kT dphi_g/dq_a on grid component a (phi = scalar spreading
weight), i.e. exactly the kernel-gradient forcing the Gibbs measure needs.
Validated against autodiff of the spread operator."""

import jax
import jax.numpy as jnp
import numpy as np

from uammd_tpu.core.box import box
from uammd_tpu.integrators.hydro.icm import ICM, icm_integrator, thermal_drift_forcing
from uammd_tpu.solvers.ibm import spread


def test_rfd_matches_kernel_gradient():
    L, n = 8.0, 16
    icm = ICM.create(box(L), n, viscosity=1.0, temperature=1.3, dt=0.01)
    q = jnp.asarray([[0.37, -0.81, 1.13]], jnp.float64)

    # analytic: kT * d/dq_a of the scalar weight field phi_g(q)
    def weights(qq):
        # spread of unit x-force, x-component = phi_g(q)
        f = jnp.ones((1, 1), jnp.float64)
        g = spread(icm.kernel, qq[None, :],
                   jnp.concatenate([f, jnp.zeros((1, 2))], axis=1),
                   icm.shape, icm.box)
        return g[..., 0]

    grad = jax.jacfwd(weights)(q[0])  # [nx, ny, nz, 3]
    expect = icm.temperature * grad

    # RFD estimator averaged over many draws (batched via vmap)
    K = 4096
    keys = jax.random.split(jax.random.key(5), K)
    est = jax.vmap(
        lambda k: thermal_drift_forcing(icm, q, k, delta=1e-4)
    )(keys)
    mean = np.asarray(jnp.mean(est, axis=0))
    ref = np.asarray(expect)
    scale = np.abs(ref).max()
    # MC error ~ kT |grad phi| / sqrt(K) -> a few % of the peak
    assert np.abs(mean - ref).max() / scale < 0.08, (
        np.abs(mean - ref).max() / scale
    )


def test_icm_integrator_runs_with_drift():
    L, n = 8.0, 8
    icm = ICM.create(box(L), n, viscosity=1.0, temperature=0.5, dt=0.01)
    integ = icm_integrator(
        lambda s, aux: (
            __import__("uammd_tpu.core.types", fromlist=["ForceEnergyVirial"])
            .ForceEnergyVirial(force=jnp.zeros_like(s.pos)),
            aux,
        ),
        icm,
    )
    from uammd_tpu.core.state import make_state

    st = make_state(jnp.zeros((4, 3)), seed=0)
    st, aux = integ.init(st, None)
    for _ in range(3):
        st, aux = integ.step(st, aux)
    assert bool(jnp.all(jnp.isfinite(st.pos)))
