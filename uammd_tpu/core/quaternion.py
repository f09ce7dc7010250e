"""Quaternion algebra for rigid-body orientations.

TPU-native analog of the reference's quaternion type (reference:
src/utils/quaternion.cuh:15 — used by the BDHI integrators to carry the
``dir`` particle property). Quaternions are [..., 4] arrays laid out
(w, x, y, z) with w the scalar part, batched over particles; every op is a
pure elementwise/vmap-friendly function, so orientation updates fuse into
the integrator's update pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(n: int, dtype=jnp.float32):
    """[n, 4] identity quaternions (reference: quaternion.cuh constructor)."""
    q = jnp.zeros((n, 4), dtype)
    return q.at[:, 0].set(1.0)


def multiply(q, p):
    """Hamilton product q ∘ p, [..., 4] (reference: quaternion.cuh
    operator*)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def from_rotation_vector(v):
    """exp(v/2): unit quaternion rotating by angle |v| about v/|v|
    (reference: quaternion.cuh rotVec2Quaternion). Safe at |v| -> 0."""
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * theta
    # sin(x)/x, Taylor-safe
    small = theta < 1e-6
    sinc_half = jnp.where(
        small, 0.5 - theta * theta / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta)
    )
    w = jnp.cos(half)
    xyz = v * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def rotate(q, v):
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]
    (reference: quaternion.cuh getV* basis extraction generalized)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def apply_rotation(q, omega_dt):
    """Advance orientations by a rotation vector increment (reference:
    BDHI_FCM.cuh integrator: dir = rotVec2Quaternion(w dt) * dir)."""
    return normalize(multiply(from_rotation_vector(omega_dt), q))


def basis(q):
    """The rotated frame axes (3 columns), [..., 3, 3]: basis(q)[..., i, :]
    is the image of e_i (reference: quaternion.cuh getVx/getVy/getVz)."""
    e = jnp.eye(3, dtype=q.dtype)
    return jnp.stack([rotate(q, e[i]) for i in range(3)], axis=-2)
