"""Sampling warps: uniform numbers -> geometric distributions.

Implements the warp set of the reference's ``libwurblpt/sampler.hpp:34-122``
(concentric disk, uniform sphere/hemisphere, uniform triangle, cosine-weighted
hemisphere direction, uniform cone "toSphere") as pure broadcasting functions.
All take uniforms in [0,1) and are branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from .onb import onb_from_normal, to_world
from .vecmath import normalize, safe_sqrt

_PI = jnp.pi


def in_unit_disk(u):
    """Concentric (Shirley) map of u[...,2] to the unit disk; returns [..., 2]."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_ox = jnp.where(jnp.abs(ox) > 0, ox, 1.0)
    safe_oy = jnp.where(jnp.abs(oy) > 0, oy, 1.0)
    theta = jnp.where(
        use_x, (_PI / 4.0) * (oy / safe_ox), (_PI / 2.0) - (_PI / 4.0) * (ox / safe_oy)
    )
    degenerate = (ox == 0.0) & (oy == 0.0)
    r = jnp.where(degenerate, 0.0, r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def on_unit_sphere(u):
    """Uniform direction on the unit sphere from u[...,2]."""
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * _PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def on_unit_hemisphere(u):
    """Uniform direction on the +z hemisphere from u[...,2]."""
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * _PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_triangle(u):
    """Uniform barycentric (b1, b2) in a triangle (sqrt warp)."""
    su = safe_sqrt(u[..., 0])
    b1 = 1.0 - su
    b2 = u[..., 1] * su
    return jnp.stack([b1, b2], axis=-1)


def cosine_hemisphere_local(u):
    """Cosine-weighted direction around local +z; pdf = cos(theta)/pi."""
    d = in_unit_disk(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_direction(n, u):
    """Cosine-weighted direction around world normal n (sampler.hpp cosineDirection)."""
    t, b = onb_from_normal(n)
    return to_world(cosine_hemisphere_local(u), t, b, n)


def cone_direction_local(cos_theta_max, u):
    """Uniform direction in a cone of half-angle acos(cos_theta_max) around +z.

    pdf = 1 / (2 pi (1 - cos_theta_max)) over solid angle (sampler.hpp toSphere).
    """
    z = 1.0 + u[..., 0] * (cos_theta_max - 1.0)
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * _PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def to_sphere(center_dir, cos_theta_max, u):
    """Uniform direction in the cone subtended by a sphere seen along center_dir.

    cos_theta_max broadcasts against u[..., 0] (i.e. shape [...] for u [..., 2]).
    """
    axis = normalize(center_dir)
    t, b = onb_from_normal(axis)
    local = cone_direction_local(cos_theta_max, u)
    return to_world(local, t, b, axis)


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (beta=2) weight for strategy a (wurblpt.hpp:101-106)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    denom = a2 + b2
    return jnp.where(denom > 0.0, a2 / jnp.where(denom > 0.0, denom, 1.0), 0.0)
