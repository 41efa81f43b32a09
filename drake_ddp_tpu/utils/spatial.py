"""Rotation / quaternion helpers (wxyz convention, matching Drake's
floating-base state layout: q = [qw qx qy qz, px py pz])."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix: hat(v) @ u == cross(v, u)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_integrate(q: jax.Array, w_world: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by world-frame angular velocity:
    q' = normalize(q + dt * 0.5 * [0, w] * q)  (Drake's qdot = N(q) v
    relation for a quaternion floating base)."""
    wq = jnp.concatenate([jnp.zeros_like(w_world[..., :1]), w_world], axis=-1)
    qdot = 0.5 * quat_mul(wq, q)
    q_new = q + dt * qdot
    return q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)


def axis_angle_rot(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation about a (constant unit) axis."""
    K = hat(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + s[..., None, None] * K + (1 - c)[..., None, None] * (K @ K)


def rpy_to_rot(rpy) -> np.ndarray:
    """URDF rpy (roll-pitch-yaw, extrinsic XYZ) -> rotation matrix (host)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
