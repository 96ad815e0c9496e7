"""Quaternion rotations as pure JAX functions.

Matches the semantics of src/Quaternion.cpp: axis-angle construction
(degrees or radians), Hamilton product, and v' = q * v * q~ rotation.
All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constants as const


def from_axis_angle(axis, angle_rad):
    """Quaternion [w,x,y,z] rotating by ``angle_rad`` about ``axis``.

    ``axis`` need not be normalised (reference normalises internally,
    src/Quaternion.cpp axis-angle ctor).
    """
    axis = jnp.asarray(axis)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    # guard divide-by-zero: zero axis -> identity rotation
    safe = jnp.where(norm == 0.0, 1.0, norm)
    u = axis / safe
    half = jnp.asarray(angle_rad) / 2.0
    w = jnp.cos(half)
    s = jnp.sin(half)
    xyz = u * s[..., None] if s.ndim < u.ndim - 0 else u * jnp.expand_dims(s, -1)
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def from_axis_angle_deg(axis, angle_deg):
    return from_axis_angle(axis, jnp.asarray(angle_deg) * const.pi / 180.0)


def multiply(q1, q2):
    """Hamilton product of quaternions stored as [...,4] = [w,x,y,z]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def rotate(q, v):
    """Rotate vectors ``v[...,3]`` by quaternion ``q[...,4]``: q*v*q~."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    out = multiply(q, multiply(qv, conjugate(q)))
    return out[..., 1:]


def rotation_matrix(q):
    """3x3 rotation matrix equivalent of quaternion q (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n == 0.0, 0.0, 2.0 / jnp.where(n == 0.0, 1.0, n))
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
