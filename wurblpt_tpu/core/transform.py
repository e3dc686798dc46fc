"""Quaternions and TRS transformations.

Implements the semantics of the reference's ``libwurblpt/transformation.hpp:47-205``
(translation + rotation-quaternion + scale pose, composition, inverse, lerp+slerp
``mix`` for animation, look-at constructor, 4x4 matrix conversion) plus the quat
helpers from ``gvm.hpp`` (toQuat from axis/angle, slerp). Everything is a pytree of
arrays broadcasting over leading batch dims, so animation evaluation at per-ray
times vectorizes.

Quaternion layout: [x, y, z, w].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vecmath import cross, dot, normalize


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, jnp.float32))
    angle = jnp.asarray(angle, jnp.float32)
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None]], axis=-1)


def quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (fast form: v + 2w(u x v) + 2 u x (u x v))."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * cross(u, v)
    return v + w * t + cross(u, t)


def quat_slerp(a, b, t):
    """Spherical lerp with shortest-arc correction; t broadcasts over batch dims."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    d = dot(a, b, keepdims=True)
    b = jnp.where(d < 0.0, -b, b)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    # Fall back to nlerp when nearly parallel.
    use_lerp = sin_theta < 1e-4
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(wa * a + wb * b)


def quat_to_mat3(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_two_vectors(a, b):
    """Unit quaternion rotating unit vector a onto unit vector b."""
    c = cross(a, b)
    w = 1.0 + dot(a, b, keepdims=True)
    # Degenerate opposite case: pick any perpendicular axis.
    opp = w[..., 0] < 1e-6
    perp = normalize(
        jnp.where(
            (jnp.abs(a[..., 0:1]) > 0.9),
            cross(a, jnp.array([0.0, 1.0, 0.0])),
            cross(a, jnp.array([1.0, 0.0, 0.0])),
        )
    )
    q = jnp.concatenate([c, w], axis=-1)
    q_opp = jnp.concatenate([perp, jnp.zeros_like(w)], axis=-1)
    return normalize(jnp.where(opp[..., None], q_opp, q))


# ---------------------------------------------------------------------------
# TRS Transformation
# ---------------------------------------------------------------------------

class Transformation(NamedTuple):
    """TRS pose: applies scale, then rotation, then translation."""

    translation: jnp.ndarray  # [..., 3]
    rotation: jnp.ndarray     # [..., 4] quaternion
    scale: jnp.ndarray        # [..., 3]

    @staticmethod
    def identity(shape=()):
        return Transformation(
            jnp.zeros(shape + (3,), jnp.float32),
            quat_identity(shape),
            jnp.ones(shape + (3,), jnp.float32),
        )

    @staticmethod
    def make(translation=(0.0, 0.0, 0.0), rotation=None, scale=(1.0, 1.0, 1.0)):
        if rotation is None:
            rotation = quat_identity()
        scale = jnp.asarray(scale, jnp.float32)
        if scale.ndim == 0:
            scale = jnp.broadcast_to(scale, (3,))
        return Transformation(
            jnp.asarray(translation, jnp.float32), jnp.asarray(rotation, jnp.float32), scale
        )


def transform_point(tf: Transformation, p):
    return quat_rotate(tf.rotation, p * tf.scale) + tf.translation


def transform_vector(tf: Transformation, v):
    return quat_rotate(tf.rotation, v * tf.scale)


def transform_normal(tf: Transformation, n):
    """Normals transform with inverse-transpose: rotate(n / scale), renormalized."""
    return normalize(quat_rotate(tf.rotation, n / tf.scale))


def transform_direction(tf: Transformation, d):
    """Rotate a direction (ignores scale and translation)."""
    return quat_rotate(tf.rotation, d)


def compose(a: Transformation, b: Transformation) -> Transformation:
    """Composition a*b: apply b first, then a. Valid for uniform or axis-aligned-
    preserving scales (matches the reference's decomposed-pose composition)."""
    return Transformation(
        translation=transform_point(a, b.translation),
        rotation=quat_mul(a.rotation, b.rotation),
        scale=a.scale * b.scale,
    )


def inverse(tf: Transformation) -> Transformation:
    inv_rot = quat_conjugate(tf.rotation)
    inv_scale = 1.0 / tf.scale
    inv_trans = -quat_rotate(inv_rot, tf.translation) * inv_scale
    return Transformation(inv_trans, inv_rot, inv_scale)


def mix(a: Transformation, b: Transformation, t) -> Transformation:
    """Animation interpolation: lerp T and S, slerp R (transformation.hpp mix)."""
    t = jnp.asarray(t, jnp.float32)
    tt = t[..., None]
    return Transformation(
        translation=a.translation + (b.translation - a.translation) * tt,
        rotation=quat_slerp(a.rotation, b.rotation, t),
        scale=a.scale + (b.scale - a.scale) * tt,
    )


def from_lookat(eye, center, up=(0.0, 1.0, 0.0)) -> Transformation:
    """Camera pose looking from eye at center; camera looks down -z, y is up."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(center - eye)            # forward
    z = -f                                  # camera +z is backward
    x = normalize(cross(up, z))
    y = cross(z, x)
    # Rotation matrix with columns x,y,z -> quaternion.
    m00, m01, m02 = x[..., 0], y[..., 0], z[..., 0]
    m10, m11, m12 = x[..., 1], y[..., 1], z[..., 1]
    m20, m21, m22 = x[..., 2], y[..., 2], z[..., 2]
    tr = m00 + m11 + m22
    # Branch-free Shepperd's method via where-cascade.
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = normalize(jnp.stack([qx, qy, qz, w], axis=-1))
    return Transformation(eye, q, jnp.ones_like(eye))


def to_mat4(tf: Transformation):
    """Return the 4x4 matrix applying scale, rotation, then translation."""
    r = quat_to_mat3(tf.rotation) * tf.scale[..., None, :]
    top = jnp.concatenate([r, tf.translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), tf.translation.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
