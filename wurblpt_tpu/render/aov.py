"""Ground-truth AOV pass (geometry, materials, optical flow).

Reference: ``GroundTruth`` / ``getGroundTruth`` (``wurblpt.hpp:453-769``): one
deterministic center-pixel ray per pixel (randomization off, ``:664-668``), a
single closest hit, then up to 20 optional channels. Flow channels reproject the
hit point at t_prev/t_next via the hit prim's animation (``:694-713``) and the
camera reprojection (``camera.hpp:205-217``).

Returned as a dict of [H, W, C] arrays — only the requested channels are
computed (trace-time selection, the analog of the AOV bitflags).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from ..core.transform import (
    Transformation,
    inverse,
    quat_conjugate,
    quat_rotate,
    transform_point,
)
from ..scene.animation import eval_animation
from ..scene.ir import SceneArrays
from .bsdf import SceneStatic
from .camera import CameraConfig, CameraParams, camera_rays, camera_space_to_image_space, world_to_camera
from .intersect import BIG, assemble_hit, scene_raw_hit

# All 20 reference channels (wurblpt.hpp:456-476) + hit_mask:
#   bits 0-4:  world-space position / geometry normal / geometry tangent /
#              material (normal-mapped) normal / material tangent
#   bits 5-9:  the same five in camera space
#   bits 10-12: depth, distance, texcoords
#   bits 13-18: world/camera/pixel flow to prev/next frame
#   bit 19:    material index
ALL_AOVS = (
    "world_position", "geometry_normal", "geometry_tangent",
    "material_normal", "material_tangent",
    "camera_position", "camera_geometry_normal", "camera_geometry_tangent",
    "camera_material_normal", "camera_material_tangent",
    "depth", "distance", "texcoords", "material_index", "hit_mask",
    "world_flow_prev", "world_flow_next", "camera_flow_prev", "camera_flow_next",
    "pixel_flow_prev", "pixel_flow_next",
    # back-compat alias for geometry_tangent
    "tangent",
)


def _prim_anim_id(scene: SceneArrays, prim):
    n_tri = scene.n_tris
    is_tri = (prim >= 0) & (prim < n_tri)
    ti = jnp.clip(prim, 0, max(n_tri - 1, 0))
    aid_t = scene.tris.anim[ti] if n_tri > 0 else jnp.zeros_like(prim)
    if scene.n_spheres > 0:
        si = jnp.clip(prim - n_tri, 0, scene.n_spheres - 1)
        aid_s = scene.spheres.anim[si]
    else:
        aid_s = jnp.zeros_like(prim)
    return jnp.where(is_tri, aid_t, jnp.where(prim >= 0, aid_s, 0))


def get_ground_truth(
    scene: SceneArrays,
    static: SceneStatic,
    cam: CameraParams,
    cam_cfg: CameraConfig,
    width: int,
    height: int,
    t: float = 0.0,
    t_prev: float = None,
    t_next: float = None,
    aovs: Sequence[str] = ("world_position", "geometry_normal", "depth", "distance",
                           "texcoords", "material_index", "hit_mask"),
    cam_prev: CameraParams = None,
    cam_next: CameraParams = None,
) -> Dict[str, jnp.ndarray]:
    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.int32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    zeros = jnp.zeros((n_pix,))
    o, d, _ = camera_rays(
        cam, cam_cfg, jnp.stack([px, py], -1), width, height,
        jnp.float32(t), jnp.float32(t), zeros, jnp.zeros((n_pix, 2)),
        anims=scene.anims,
    )
    if static.has_anim:
        from ..scene.animation import make_anim_ctx

        anim_ctx = make_anim_ctx(scene.anims, jnp.full((n_pix,), jnp.float32(t)))
    else:
        anim_ctx = None
    tt, prim, u, v = scene_raw_hit(
        scene, o, d, jnp.full((n_pix,), 1e-4), jnp.full((n_pix,), BIG),
        anim_ctx=anim_ctx,
    )
    hr = assemble_hit(scene, o, d, tt, prim, u, v, anim_ctx=anim_ctx)

    out: Dict[str, jnp.ndarray] = {}

    def put(name, arr):
        c = arr.shape[-1] if arr.ndim > 1 else 1
        out[name] = arr.reshape(height, width, c) if arr.ndim > 1 else arr.reshape(height, width)

    hitf = hr.hit
    if "hit_mask" in aovs:
        put("hit_mask", hitf.astype(jnp.float32))
    if "world_position" in aovs:
        put("world_position", jnp.where(hitf[..., None], hr.position, 0.0))
    if "camera_position" in aovs:
        put("camera_position", jnp.where(hitf[..., None], world_to_camera(cam, hr.position), 0.0))

    # Material (normal-mapped) shading frame (wurblpt.hpp:681 via
    # tangentSpaceAt): without a normal map the material normal equals the
    # interpolated shading normal, and the material tangent is the geometry
    # tangent re-orthogonalized against it.
    from ..core.vecmath import dot as _dot, normalize as _normalize

    mat_nrm = hr.normal
    need_mat = any(a in aovs for a in (
        "material_normal", "material_tangent",
        "camera_material_normal", "camera_material_tangent"))
    if need_mat and static.has_textures:
        from .texture import sample_texture

        ntex = scene.materials.normal_tex[hr.mat]
        has_nm = ntex >= 0
        tex_n = sample_texture(scene.textures, jnp.maximum(ntex, 0), hr.uv)[..., :3]
        tex_n = tex_n * 2.0 - 1.0
        from ..core.onb import onb_from_normal_tangent, to_world

        tb, bb = onb_from_normal_tangent(hr.normal, hr.tangent)
        mapped = to_world(tex_n, tb, bb, hr.normal)
        mat_nrm = jnp.where(has_nm[..., None], _normalize(mapped), mat_nrm)
    mat_tan = _normalize(
        hr.tangent - _dot(hr.tangent, mat_nrm, keepdims=True) * mat_nrm)

    # Direction rotation into the camera frame (rotation only, no
    # translation/scale — normals/tangents are directions).
    def to_cam_dir(v):
        return quat_rotate(quat_conjugate(cam.transformation.rotation), v)

    for name, vec in (
        ("geometry_normal", hr.geom_normal),
        ("geometry_tangent", hr.tangent),
        ("tangent", hr.tangent),            # back-compat alias
        ("material_normal", mat_nrm),
        ("material_tangent", mat_tan),
    ):
        if name in aovs:
            put(name, jnp.where(hitf[..., None], vec, 0.0))
    for name, vec in (
        ("camera_geometry_normal", hr.geom_normal),
        ("camera_geometry_tangent", hr.tangent),
        ("camera_material_normal", mat_nrm),
        ("camera_material_tangent", mat_tan),
    ):
        if name in aovs:
            put(name, jnp.where(hitf[..., None], to_cam_dir(vec), 0.0))

    if "depth" in aovs:
        p_cam = world_to_camera(cam, hr.position)
        put("depth", jnp.where(hitf, -p_cam[..., 2], 0.0))
    if "distance" in aovs:
        put("distance", jnp.where(hitf, hr.t, 0.0))
    if "texcoords" in aovs:
        put("texcoords", jnp.where(hitf[..., None], hr.uv, 0.0))
    if "material_index" in aovs:
        put("material_index", jnp.where(hitf, hr.mat, -1).astype(jnp.int32))

    # Flow channels (wurblpt.hpp:694-713): world position at t_prev/t_next via
    # p_other = T_other(T_t^{-1}(p)) using the hit prim's animation.
    need_flow = any(a.endswith(("_prev", "_next")) for a in aovs)
    if need_flow:
        aid = _prim_anim_id(scene, prim)
        times_now = jnp.full((n_pix,), jnp.float32(t))
        tf_now = eval_animation(scene.anims, aid, times_now)
        inv_now = inverse(tf_now)
        p_obj = transform_point(inv_now, hr.position)
        for tag, t_other, cam_other in (
            ("prev", t_prev, cam_prev),
            ("next", t_next, cam_next),
        ):
            if t_other is None:
                continue
            tf_o = eval_animation(scene.anims, aid, jnp.full((n_pix,), jnp.float32(t_other)))
            p_world_o = transform_point(tf_o, p_obj)
            if f"world_flow_{tag}" in aovs:
                put(f"world_flow_{tag}", jnp.where(hitf[..., None], p_world_o - hr.position, 0.0))
            c_other = cam_other if cam_other is not None else cam
            p_cam_now = world_to_camera(cam, hr.position)
            p_cam_o = world_to_camera(c_other, p_world_o)
            if f"camera_flow_{tag}" in aovs:
                put(f"camera_flow_{tag}", jnp.where(hitf[..., None], p_cam_o - p_cam_now, 0.0))
            if f"pixel_flow_{tag}" in aovs:
                pix_now = jnp.stack([px, py], -1)
                pix_o = camera_space_to_image_space(c_other, cam_cfg, p_cam_o, width, height)
                put(f"pixel_flow_{tag}", jnp.where(hitf[..., None], pix_o - pix_now, 0.0))

    return out
