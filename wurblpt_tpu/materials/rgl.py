"""RGL (EPFL) measured-material evaluation.

The reference evaluates measured BRDFs through the vendored powitacq library
(``material_rgl.hpp`` + ``powitacq*.inl``, ~2.7k LoC of tensor interpolation).
The TPU port turns the powitacq tensors into array gathers; until the table
loader lands (tracked in SURVEY.md section 7 "RGL/powitacq port"), lanes with RGL
materials fall back to a diffuse lobe with a neutral 0.5 albedo so scenes keep
rendering.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import sampler
from ..core.vecmath import dot

_INV_PI = 1.0 / jnp.pi


def rgl_sample_lanes(scene, hr, wo, u2):
    """Returns (direction, f*cos, pdf, ok) for RGL lanes."""
    n = hr.normal
    d = sampler.cosine_direction(n, u2)
    cos_t = jnp.maximum(dot(d, n), 0.0)
    p = cos_t * _INV_PI
    fcos = jnp.broadcast_to((0.5 * p)[..., None], p.shape + (4,))
    ok = jnp.ones(p.shape, bool)
    return d, fcos, p, ok


def rgl_eval_lanes(scene, hr, wo, wd):
    """Returns (f*cos, pdf, ok) for RGL lanes."""
    cos_t = jnp.maximum(dot(wd, hr.normal), 0.0)
    p = cos_t * _INV_PI
    fcos = jnp.broadcast_to((0.5 * p)[..., None], p.shape + (4,))
    return fcos, p, jnp.ones(p.shape, bool)
