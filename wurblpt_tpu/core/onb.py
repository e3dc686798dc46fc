"""Orthonormal basis construction (tangent spaces).

Branch-free Duff et al. JCGT 2017 construction, matching the semantics of the
reference's ``libwurblpt/tangentspace.hpp:47-138`` (ONB from a normal alone, or
from normal + supplied tangent via Gram-Schmidt).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import cross, dot, normalize


def onb_from_normal(n):
    """Build (tangent, bitangent) for unit normal n. Branch-free Duff et al.

    Returns (t, b) with [t, b, n] right-handed orthonormal.
    """
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    bvar = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * bvar, -sign * n[..., 0]], axis=-1
    )
    b = jnp.stack([bvar, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, b


def onb_from_normal_tangent(n, t):
    """Gram-Schmidt a supplied tangent against n (tangentspace.hpp normal+tangent path)."""
    t = normalize(t - dot(t, n, keepdims=True) * n)
    b = cross(n, t)
    return t, b


def to_world(local_dir, t, b, n):
    """Transform a tangent-space direction (x=t, y=b, z=n) to world space."""
    return (
        local_dir[..., 0:1] * t + local_dir[..., 1:2] * b + local_dir[..., 2:3] * n
    )


def to_local(world_dir, t, b, n):
    """Transform a world direction into the (t, b, n) tangent frame."""
    return jnp.stack(
        [
            jnp.sum(world_dir * t, axis=-1),
            jnp.sum(world_dir * b, axis=-1),
            jnp.sum(world_dir * n, axis=-1),
        ],
        axis=-1,
    )
