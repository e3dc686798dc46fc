"""Fresnel reflectance terms (semantics of ``libwurblpt/fresnel.hpp:33-72``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import safe_sqrt


def schlick_r0(n_i, n_t):
    """Normal-incidence reflectance from refractive indices."""
    r = (n_i - n_t) / (n_i + n_t)
    return r * r


def fresnel_schlick(cos_theta, r0):
    """Schlick approximation; broadcasts over channel dims of r0."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return r0 + (1.0 - r0) * (c ** 5)


def fresnel_unpolarized(cos_i, n_i, n_t):
    """Exact unpolarized Fresnel reflectance for dielectrics.

    cos_i >= 0 is the cosine at the incident side; handles TIR (returns 1).
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    eta = n_i / n_t
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_s = (n_i * cos_i - n_t * cos_t) / jnp.maximum(n_i * cos_i + n_t * cos_t, 1e-12)
    r_p = (n_i * cos_t - n_t * cos_i) / jnp.maximum(n_i * cos_t + n_t * cos_i, 1e-12)
    f = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(tir, 1.0, f)
