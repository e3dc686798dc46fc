"""Next-event-estimation light ("hot spot") sampling and pdf evaluation.

Reference semantics: ``Hitable::pdfValue``/``direction`` for triangles
(``hitable_triangle.hpp:405-443``) and spheres (``hitable_sphere.hpp:155-219``),
combined in the integrator as a uniform pick over hot spots whose mixture pdf is
the average of all per-light solid-angle pdfs (``wurblpt.hpp:181-195``). Here the
per-light pdfs are evaluated batched over a [RAYS x LIGHTS] broadcast.

ANIMATED emitters: the reference evaluates light geometry at ray time through
the AnimationCache (hitable_triangle.hpp:405-443 uses the cached transform).
Here, when any hot spot is animated, `light_frames` gathers each light's
forward TRS map at each ray's time from the per-trace AnimCtx, and all
pdf/sample/emission math runs on the world-space geometry of that instant —
moving lights keep their full NEE contribution and MIS stays consistent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import sampler
from ..core.vecmath import cross, dot, normalize, safe_sqrt
from ..scene.ir import SceneArrays

_TWO_PI = 2.0 * jnp.pi


def light_anim_ids(scene: SceneArrays):
    """[L] int32 animation id of each hot-spot prim (0 = static)."""
    lp = scene.light_prims
    n_tri = scene.n_tris
    is_tri = lp < n_tri
    a_tri = (
        scene.tris.anim[jnp.clip(lp, 0, max(n_tri - 1, 0))]
        if n_tri > 0 else jnp.zeros_like(lp)
    )
    a_sph = (
        scene.spheres.anim[jnp.clip(lp - n_tri, 0, scene.n_spheres - 1)]
        if scene.n_spheres > 0 else jnp.zeros_like(lp)
    )
    return jnp.where(is_tri, a_tri, a_sph)


def light_frames(scene: SceneArrays, anim_ctx):
    """Per-ray forward frames of every hot spot's animation at ray time.

    Returns (m [N,L,3,3], t [N,L,3]); requires anim_ctx built with
    ``with_forward=True``.
    """
    aid = light_anim_ids(scene)
    return anim_ctx.m_fwd[:, aid], anim_ctx.t_inv[:, aid]


def _light_tri_data(scene: SceneArrays, frames):
    """Triangle geometry for tri hot spots, broadcast-ready as [B,L,3]
    (B=1 static, B=N animated via `frames`). Sphere entries get zeros."""
    lp = scene.light_prims
    n_tri = scene.n_tris
    L = lp.shape[0]
    is_tri = lp < n_tri
    if n_tri == 0:
        z = jnp.zeros((1, L, 3), jnp.float32)
        return is_tri, z, z, z
    ti = jnp.clip(lp, 0, n_tri - 1)
    T = scene.tris
    p0, e1, e2 = T.p0[ti][None], T.e1[ti][None], T.e2[ti][None]
    if frames is not None:
        m, t = frames
        p0 = jnp.einsum("nlij,blj->nli", m, p0) + t
        e1 = jnp.einsum("nlij,blj->nli", m, e1)
        e2 = jnp.einsum("nlij,blj->nli", m, e2)
    return is_tri, p0, e1, e2


def _light_sphere_data(scene: SceneArrays, frames):
    lp = scene.light_prims
    n_tri = scene.n_tris
    L = lp.shape[0]
    if scene.n_spheres == 0:
        return jnp.zeros((1, L, 3), jnp.float32), jnp.zeros((1, L), jnp.float32)
    si = jnp.clip(lp - n_tri, 0, scene.n_spheres - 1)
    S = scene.spheres
    center, radius = S.center[si][None], S.radius[si][None]
    if frames is not None:
        m, t = frames
        center = jnp.einsum("nlij,blj->nli", m, center) + t
        # Sphere radius under TRS scale (uniform scale assumed, like the
        # reference's animated sphere): |M column| = s.
        s_mean = jnp.linalg.norm(m, axis=-2).mean(-1)
        radius = radius * s_mean
    return center, radius


def lights_pdf_sum(
    scene: SceneArrays, origin, direction, frames=None
) -> jnp.ndarray:
    """Mixture pdf (1/L * sum of per-light solid-angle pdfs) of `direction` from
    `origin` (wurblpt.hpp:181-185 / :193-195). origin/direction: [N,3]."""
    L = scene.light_prims.shape[0]
    if L == 0:
        return jnp.zeros(origin.shape[:-1])
    is_tri, p0, e1, e2 = _light_tri_data(scene, frames)
    center, radius = _light_sphere_data(scene, frames)

    o = origin[:, None, :]
    d = direction[:, None, :]

    # Triangle pdf: intersect; pdf = t^2 / (|cos| * area) (hitable_triangle.hpp:405-423).
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    tri_hit = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    fn = jnp.cross(e1, e2)  # [B,L,3], length = 2*area
    fn_len = jnp.linalg.norm(fn, axis=-1)
    area = 0.5 * fn_len
    cos_l = jnp.abs(jnp.sum(d * (fn / jnp.maximum(fn_len, 1e-20)[..., None]), axis=-1))
    pdf_tri = jnp.where(
        tri_hit, t * t / jnp.maximum(cos_l * area, 1e-12), 0.0
    )

    # Sphere pdf: uniform cone (hitable_sphere.hpp:155-219).
    oc = center - o
    dist2 = jnp.sum(oc * oc, axis=-1)
    r2 = radius * radius
    outside = dist2 > r2
    sin2_max = jnp.clip(r2 / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin2_max)
    solid = _TWO_PI * (1.0 - cos_max)
    cos_dir = jnp.sum(d * oc, axis=-1) / jnp.maximum(jnp.sqrt(dist2), 1e-12)
    in_cone = cos_dir >= cos_max
    pdf_sph = jnp.where(outside & in_cone & (solid > 1e-12), 1.0 / jnp.maximum(solid, 1e-12), 0.0)

    per_light = jnp.where(is_tri[None, :], pdf_tri, pdf_sph)
    return jnp.sum(per_light, axis=1) / L


def lights_sample(
    scene: SceneArrays, origin, u3, frames=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick a hot spot uniformly and sample a direction toward it
    (wurblpt.hpp:187-190). Returns (direction [N,3], picked_prim [N],
    dist_hint [N], pick [N] light-list index). The mixture pdf must be
    computed via lights_pdf_sum."""
    L = scene.light_prims.shape[0]
    pick = jnp.clip((u3[..., 0] * L).astype(jnp.int32), 0, L - 1)
    lp = scene.light_prims[pick]
    n_tri = scene.n_tris
    is_tri = lp < n_tri
    n = origin.shape[0]

    if frames is not None:
        m_all, t_all = frames
        rows = jnp.arange(n)
        m_pick = m_all[rows, pick]          # [N,3,3]
        t_pick = t_all[rows, pick]          # [N,3]
    else:
        m_pick = t_pick = None

    # Triangle: uniform point.
    if n_tri > 0:
        ti = jnp.clip(lp, 0, n_tri - 1)
        T = scene.tris
        p0, e1, e2 = T.p0[ti], T.e1[ti], T.e2[ti]
        if m_pick is not None:
            p0 = jnp.einsum("nij,nj->ni", m_pick, p0) + t_pick
            e1 = jnp.einsum("nij,nj->ni", m_pick, e1)
            e2 = jnp.einsum("nij,nj->ni", m_pick, e2)
        bary = sampler.in_triangle(u3[..., 1:3])
        q = p0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2
        d_tri = q - origin
        dist_tri = jnp.linalg.norm(d_tri, axis=-1)
        d_tri = d_tri / jnp.maximum(dist_tri, 1e-12)[..., None]
    else:
        d_tri = jnp.zeros_like(origin)
        dist_tri = jnp.zeros(origin.shape[:-1])

    # Sphere: cone sample.
    if scene.n_spheres > 0:
        si = jnp.clip(lp - n_tri, 0, scene.n_spheres - 1)
        S = scene.spheres
        center = S.center[si]
        radius = S.radius[si]
        if m_pick is not None:
            center = jnp.einsum("nij,nj->ni", m_pick, center) + t_pick
            radius = radius * jnp.linalg.norm(m_pick, axis=-2).mean(-1)
        oc = center - origin
        dist2 = jnp.sum(oc * oc, axis=-1)
        sin2_max = jnp.clip(radius * radius / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
        cos_max = safe_sqrt(1.0 - sin2_max)
        d_sph = sampler.to_sphere(oc, cos_max, u3[..., 1:3])
        dist_sph = jnp.sqrt(dist2)
    else:
        d_sph = jnp.zeros_like(origin)
        dist_sph = jnp.zeros(origin.shape[:-1])

    direction = jnp.where(is_tri[..., None], d_tri, d_sph)
    dist = jnp.where(is_tri, dist_tri, dist_sph)
    return direction, lp, dist, pick
