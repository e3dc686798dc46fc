"""Homogeneous participating media: free-path sampling along traced segments.

Reference ``HitableMedium`` (hitable_medium.hpp:38-99): the medium boundary is
probed twice per segment (entry via front-side hit or ray-starts-inside, exit
via the following boundary hit), then an exponential free path
``dist = -log(u)/rho`` (hitable_medium.hpp:89-92) decides whether the segment
scatters inside the medium before reaching the nearest solid surface. Media
never deterministically occlude — shadow rays are blocked stochastically the
same way, matching the reference where media participate in the scene BVH.

Boundary geometry is brute-force tested per medium (boundaries are small:
a sphere or a low-poly shell); each medium is independent, like the
reference's one-nested-BVH-per-medium design, so overlapping media compose.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.rng import Salt, uniform1
from ..core.vecmath import dot, safe_sqrt
from ..scene.ir import MediumArrays, SceneArrays

# Host scalar, NOT jnp: a module-level device array becomes a hoisted
# const_arg in every program that closes over it (jax 0.9.0 drops those
# on cross-program re-dispatch; see tests/conftest.py).
BIG = np.float32(3.0e37)
_EPS = 1e-4


def _medium_boundary_hit(media: MediumArrays, m: int, o, d, t_min):
    """Closest boundary hit of medium `m` after t_min.

    Returns (t [N], backside [N], found [N]). Brute force over the medium's
    prims; `m` is a static Python int.
    """
    n = o.shape[0]
    best_t = jnp.full((n,), BIG)
    best_back = jnp.zeros((n,), bool)

    mt = media.tri_med.shape[0]
    if mt > 0:
        sel = media.tri_med == m
        ox, dx = o[:, None, :], d[:, None, :]
        p0 = media.tri_p0[None, :, :]
        e1 = media.tri_e1[None, :, :]
        e2 = media.tri_e2[None, :, :]
        pvec = jnp.cross(dx, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        tvec = ox - p0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(dx * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        ok = (
            sel[None, :]
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min[:, None])
        )
        t = jnp.where(ok, t, BIG)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        tj = t[rows, j]
        # backside: geometric normal faces along the ray (exiting).
        fn = jnp.cross(media.tri_e1[j], media.tri_e2[j])
        back = dot(d, fn) > 0.0
        closer = tj < best_t
        best_back = jnp.where(closer, back, best_back)
        best_t = jnp.where(closer, tj, best_t)

    ms = media.sph_med.shape[0]
    if ms > 0:
        sel = media.sph_med == m
        oc = o[:, None, :] - media.sph_center[None, :, :]
        dx = d[:, None, :]
        a = jnp.sum(dx * dx, axis=-1)
        half_b = jnp.sum(oc * dx, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - (media.sph_radius * media.sph_radius)[None, :]
        disc = half_b * half_b - a * c
        sq = safe_sqrt(disc)
        q = -(half_b + jnp.sign(half_b) * sq)
        t0 = q / jnp.maximum(a, 1e-20)
        t1 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
        tlo = jnp.minimum(t0, t1)
        thi = jnp.maximum(t0, t1)
        t = jnp.where(tlo > t_min[:, None], tlo, thi)
        ok = sel[None, :] & (disc > 0.0) & (t > t_min[:, None])
        t = jnp.where(ok, t, BIG)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        tj = t[rows, j]
        p = o + tj[:, None] * d
        back = dot(d, p - media.sph_center[j]) > 0.0
        closer = tj < best_t
        best_back = jnp.where(closer, back, best_back)
        best_t = jnp.where(closer, tj, best_t)

    return best_t, best_back, best_t < BIG


def apply_media(
    scene: SceneArrays,
    o,
    d,
    t_min,
    t_solid,
    prim_solid,
    u_solid,
    v_solid,
    pixel_id,
    sample_id,
    bounce,
    salt_ctx: int,
):
    """Fold medium scattering into the closest-hit result of a segment.

    For each medium: find entry (front hit, or t_min when the segment starts
    inside), exit (next boundary hit), sample dist = -log(1-u)/rho; a scatter
    at entry+dist happens if it precedes both the exit and the nearest solid
    hit (hitable_medium.hpp:69-98). Returns (t, prim, u, v, med_mask, med_mat)
    where medium-scatter lanes carry prim = n_solid_prims + medium_id.
    """
    media = scene.media
    n_media = int(media.count)
    n_solid = scene.n_tris + scene.n_spheres

    t_best = t_solid
    prim_best = prim_solid
    med_mask = jnp.zeros(t_solid.shape, bool)
    med_mat = jnp.zeros(t_solid.shape, jnp.int32)

    for m in range(n_media):
        t1, back1, found1 = _medium_boundary_hit(media, m, o, d, t_min)
        entry = jnp.where(back1, t_min, t1)
        # Exit: when starting inside, the first boundary hit IS the exit;
        # otherwise the next boundary hit after entry.
        t2, _, found2 = _medium_boundary_hit(media, m, o, d, entry + _EPS)
        exit_t = jnp.where(back1, t1, t2)
        rho = media.density[m]
        u = uniform1(pixel_id, sample_id, bounce,
                     Salt.MEDIUM + (salt_ctx << 8) + m)
        dist = -jnp.log1p(-jnp.clip(u, 0.0, 0.999999)) / jnp.maximum(rho, 1e-20)
        t_sc = entry + dist
        hit_m = found1 & (t_sc < exit_t) & (t_sc < t_best)
        t_best = jnp.where(hit_m, t_sc, t_best)
        prim_best = jnp.where(hit_m, n_solid + m, prim_best)
        med_mask = jnp.where(hit_m, True, med_mask)
        med_mat = jnp.where(hit_m, media.phase_mat[m], med_mat)

    u_best = jnp.where(med_mask, 0.0, u_solid)
    v_best = jnp.where(med_mask, 0.0, v_solid)
    return t_best, prim_best, u_best, v_best, med_mask, med_mat
