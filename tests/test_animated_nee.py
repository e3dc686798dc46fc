"""Animated emitters keep their NEE contribution; animated cameras work.

VERDICT round 1 item 7: the reference evaluates light geometry at ray time
(hitable_triangle.hpp:405-443 via AnimationCache) and cameras can own an
Animation (camera.hpp:56-111). Both must render identically to an equivalent
static scene evaluated at the same instant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wurblpt_tpu import (
    CameraConfig,
    RenderParams,
    SceneStatic,
    SensorRGB,
    make_camera,
)
from wurblpt_tpu.core.transform import (
    Transformation,
    from_lookat,
    quat_from_axis_angle,
)
import numpy as _np


def _rot_x(deg):
    return quat_from_axis_angle((1.0, 0.0, 0.0), _np.deg2rad(deg))
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.scene.builder import (
    AnimationKeyframes,
    Lambertian,
    LightDiffuse,
    MeshInstance,
    Scene,
)
from wurblpt_tpu.scene.generator import generate_quad

PARAMS = RenderParams(max_path_components=4)


def _light_room(light_x: float, animate: bool):
    """Floor quad + small emissive quad above, optionally keyframed to slide
    from x=-1 to x=+1 over t in [0,1] (so t=0.5 + light_x=0 match)."""
    sc = Scene()
    floor = generate_quad(2.0, 2.0)
    sc.take_mesh_instance(MeshInstance(
        mesh=floor, material=Lambertian(albedo=(0.8, 0.8, 0.8)),
        transformation=Transformation.make(
            translation=(0, 0, 0), rotation=_rot_x(-90.0)),
    ))
    lamp = generate_quad(0.3, 0.3)
    if animate:
        aid = sc.take_animation(AnimationKeyframes(
            times=[0.0, 1.0],
            transformations=[
                Transformation.make(translation=(-1.0, 1.5, 0.0),
                                    rotation=_rot_x(90.0)),
                Transformation.make(translation=(1.0, 1.5, 0.0),
                                    rotation=_rot_x(90.0)),
            ],
        ))
        sc.take_mesh_instance(MeshInstance(
            mesh=lamp, material=LightDiffuse(radiance=(20.0, 20.0, 20.0)),
            animation=aid,
        ), hot_spot=True)
    else:
        sc.take_mesh_instance(MeshInstance(
            mesh=lamp, material=LightDiffuse(radiance=(20.0, 20.0, 20.0)),
            transformation=Transformation.make(
                translation=(light_x, 1.5, 0.0),
                rotation=_rot_x(90.0)),
        ), hot_spot=True)
    return sc.build(use_bvh=False, t0=0.0, t1=1.0)


def _render(arrays, t, w=24, h=24):
    static = SceneStatic.from_scene(arrays)
    pose = from_lookat((0, 2.5, 3.5), (0, 0, 0))
    cam = make_camera(transformation=pose, vfov_deg=50, width=w, height=h)
    return np.asarray(render_frame(
        arrays, static, cam, CameraConfig(), SensorRGB(), w, h, 4,
        t0=t, t1=t, params=PARAMS,
    ))


def test_animated_light_nee_matches_static():
    """Render the moving lamp at t=0.5 (lamp at x=0): direct lighting must
    match a static scene with the lamp placed at x=0."""
    img_anim = _render(_light_room(0.0, animate=True), t=0.5)
    img_stat = _render(_light_room(0.0, animate=False), t=0.0)
    assert np.isfinite(img_anim).all()
    # The animated render must carry the full NEE contribution (round 1 lost
    # it entirely -> floor went dark). Mean brightness within a few percent.
    bright_s = img_stat.mean()
    assert abs(img_anim.mean() - bright_s) / bright_s < 0.05, (
        img_anim.mean(), bright_s)
    # And the spatial pattern agrees (same lamp position).
    np.testing.assert_allclose(img_anim, img_stat, atol=0.25 * img_stat.max())


def test_animated_light_moves_highlight():
    """At t=0 vs t=1 the lamp sits at x=-1 vs x=+1: the floor brightness peak
    must follow it."""
    arrays = _light_room(0.0, animate=True)
    img0 = _render(arrays, t=0.0)
    img1 = _render(arrays, t=1.0)
    h, w, _ = img0.shape
    left0 = img0[:, : w // 2].mean()
    right0 = img0[:, w // 2:].mean()
    left1 = img1[:, : w // 2].mean()
    right1 = img1[:, w // 2:].mean()
    assert left0 > right0 * 1.1, (left0, right0)
    assert right1 > left1 * 1.1, (left1, right1)


def test_animated_camera_matches_static_pose():
    """A camera driven by a keyframe animation evaluated at t must produce the
    same image as a static camera fixed at that pose."""
    sc_arrays = _light_room(0.0, animate=False)
    static = SceneStatic.from_scene(sc_arrays)
    w = h = 24

    pose_a = from_lookat((0, 2.5, 3.5), (0, 0, 0))
    pose_b = from_lookat((1.5, 2.0, 3.0), (0, 0, 0))

    # Static render at pose_b.
    cam_s = make_camera(transformation=pose_b, vfov_deg=50, width=w, height=h)
    img_static = np.asarray(render_frame(
        sc_arrays, static, cam_s, CameraConfig(), SensorRGB(), w, h, 3,
        t0=1.0, t1=1.0, params=PARAMS,
    ))

    # Animated camera: keyframes pose_a -> pose_b over [0,1], rendered at t=1.
    sc = Scene()
    floor = generate_quad(2.0, 2.0)
    sc.take_mesh_instance(MeshInstance(
        mesh=floor, material=Lambertian(albedo=(0.8, 0.8, 0.8)),
        transformation=Transformation.make(
            translation=(0, 0, 0), rotation=_rot_x(-90.0)),
    ))
    lamp = generate_quad(0.3, 0.3)
    sc.take_mesh_instance(MeshInstance(
        mesh=lamp, material=LightDiffuse(radiance=(20.0, 20.0, 20.0)),
        transformation=Transformation.make(
            translation=(0.0, 1.5, 0.0), rotation=_rot_x(90.0)),
    ), hot_spot=True)
    cam_aid = sc.take_animation(AnimationKeyframes(
        times=[0.0, 1.0], transformations=[pose_a, pose_b],
    ))
    arrays2 = sc.build(use_bvh=False, t0=0.0, t1=1.0)
    static2 = SceneStatic.from_scene(arrays2)

    cam_a = make_camera(vfov_deg=50, width=w, height=h)  # identity local pose
    img_anim = np.asarray(render_frame(
        arrays2, static2, cam_a, CameraConfig(anim_id=cam_aid), SensorRGB(),
        w, h, 3, t0=1.0, t1=1.0, params=PARAMS,
    ))
    np.testing.assert_allclose(img_anim, img_static, atol=1e-4)
