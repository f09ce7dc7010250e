"""Rotational BDHI: Euler-Maruyama with torques and quaternion orientations.

TPU-native analog of the reference's FCM integrator with torques (reference:
src/Integrator/BDHI/BDHI_FCM.cuh — forwardTime computes linear AND angular
hydrodynamic displacements and advances the ``dir`` quaternion by
rotVec2Quaternion(dPhi); utils/quaternion.cuh:15):

    dX   = M_tt F dt + M_tr T dt + sqrt(2 kT dt) (B dW)_trans
    dPhi = M_rt F dt + M_rr T dt + sqrt(2 kT dt) (B dW)_rot
    dir <- exp(dPhi / 2) * dir

The coupled mobility and its fluctuation come from one FCM spectral pass
(fcm.FCM.compute_mf_bdw_torques). Torques are supplied by
``force_torque_fn(state, aux) -> (force [N,3], torque [N,3], aux)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import quaternion as quat
from ...core.state import next_key
from ..base import Integrator, advance_time


def bdhi_fcm_rotational(
    force_torque_fn,
    fcm,
    dt: float,
    temperature: float = 0.0,
) -> Integrator:
    """EulerMaruyama over (pos, dir) with the FCM grand mobility."""

    def init(state, aux):
        if state.dir is None:
            state = state.replace(dir=quat.identity(state.pos.shape[0],
                                                    state.dtype))
        if state.force is None:
            state = state.replace(force=jnp.zeros_like(state.pos))
        if state.torque is None:
            state = state.replace(torque=jnp.zeros_like(state.pos))
        return state, aux

    def step(state, aux):
        h = jnp.asarray(dt, state.dtype)
        force, torque, aux = force_torque_fn(state, aux)
        if temperature > 0:
            state, k = next_key(state)
            amp = jnp.sqrt(2.0 * temperature / h)
            v, w = fcm.compute_mf_bdw_torques(state.pos, force, torque, k, amp)
        else:
            v, w = fcm.compute_hydrodynamic_displacements(
                state.pos, force, torque
            )
        new_dir = quat.apply_rotation(state.dir, h * w)
        return advance_time(
            state.replace(pos=state.pos + h * v, dir=new_dir,
                          force=force, torque=torque),
            dt,
        ), aux

    return Integrator(init=init, step=step)
