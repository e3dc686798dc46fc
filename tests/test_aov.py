"""Ground-truth AOV channels (wurblpt.hpp:453-769): values, frames, and flow.

Round-3 coverage for the previously untested AOV pass, including the four
camera-space normal/tangent channels and the material-vs-geometry tangent
split added this round (wurblpt.hpp:456-476 bits 2,4,6-9).
"""

import numpy as np

import jax.numpy as jnp

from wurblpt_tpu import CameraConfig, SceneStatic, make_camera
from wurblpt_tpu.core.transform import Transformation, from_lookat, quat_from_axis_angle
from wurblpt_tpu.render.aov import ALL_AOVS, get_ground_truth
from wurblpt_tpu.scene.builder import (
    ImageTexture, Lambertian, LightDiffuse, MeshInstance, Scene, SphereObject,
)
from wurblpt_tpu.scene.builder import AnimationKeyframes
from wurblpt_tpu.scene.generator import generate_quad


def _quad_scene(normal_map=None, animation=None):
    sc = Scene()
    aid = sc.take_animation(animation) if animation is not None else None
    sc.take_mesh_instance(MeshInstance(
        mesh=generate_quad(1.0, 1.0),
        material=Lambertian(albedo=(0.8, 0.8, 0.8), normal_map=normal_map),
        animation=aid))
    sc.take_sphere(SphereObject((0, 0, 5), 0.2,
                                LightDiffuse(radiance=(5.0,) * 3)),
                   hot_spot=True)
    return sc.build()


def test_aov_frames_and_depth():
    scene = _quad_scene()
    static = SceneStatic.from_scene(scene)
    w = h = 16
    cam = make_camera(transformation=from_lookat((0, 0, 2), (0, 0, 0)),
                      vfov_deg=40.0, width=w, height=h)
    gt = get_ground_truth(scene, static, cam, CameraConfig(), w, h,
                          aovs=ALL_AOVS)
    c = (h // 2, w // 2)
    # quad in the xy plane, +z normal; camera looks down -z from z=2
    np.testing.assert_allclose(np.asarray(gt["geometry_normal"])[c], [0, 0, 1],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt["material_normal"])[c], [0, 0, 1],
                               atol=1e-5)
    # camera space: the +z world normal faces the camera -> +z in camera frame
    np.testing.assert_allclose(np.asarray(gt["camera_geometry_normal"])[c],
                               [0, 0, 1], atol=1e-5)
    # f32 quaternion round trip in from_lookat leaves ~1e-3 slack
    np.testing.assert_allclose(np.asarray(gt["depth"])[c], 2.0, atol=3e-3)
    np.testing.assert_allclose(np.asarray(gt["distance"])[c], 2.0, atol=3e-3)
    assert np.asarray(gt["hit_mask"])[c] == 1.0
    assert np.asarray(gt["material_index"])[c] == 0
    # tangents are unit and orthogonal to their normals, in both spaces
    for tan_name, nrm_name in (
        ("geometry_tangent", "geometry_normal"),
        ("material_tangent", "material_normal"),
        ("camera_geometry_tangent", "camera_geometry_normal"),
        ("camera_material_tangent", "camera_material_normal"),
    ):
        tan = np.asarray(gt[tan_name])[c]
        nrm = np.asarray(gt[nrm_name])[c]
        assert abs(np.linalg.norm(tan) - 1.0) < 1e-4
        assert abs(float(tan @ nrm)) < 1e-4


def test_aov_material_normal_differs_with_normal_map():
    tilt = np.array([np.sin(0.5), 0.0, np.cos(0.5)])
    texel = (tilt + 1.0) / 2.0
    nm = ImageTexture(image=np.full((4, 4, 3), texel, np.float32), srgb=False)
    scene = _quad_scene(normal_map=nm)
    static = SceneStatic.from_scene(scene)
    w = h = 8
    cam = make_camera(transformation=from_lookat((0, 0, 2), (0, 0, 0)),
                      vfov_deg=40.0, width=w, height=h)
    gt = get_ground_truth(scene, static, cam, CameraConfig(), w, h,
                          aovs=("geometry_normal", "material_normal",
                                "material_tangent"))
    c = (h // 2, w // 2)
    gn = np.asarray(gt["geometry_normal"])[c]
    mn = np.asarray(gt["material_normal"])[c]
    mt = np.asarray(gt["material_tangent"])[c]
    # geometry normal unperturbed, material normal tilted by the map
    np.testing.assert_allclose(gn, [0, 0, 1], atol=1e-5)
    assert abs(mn[2] - np.cos(0.5)) < 2e-3
    # material tangent re-orthogonalized against the perturbed normal
    assert abs(float(mt @ mn)) < 1e-4


def test_aov_pixel_flow_of_translating_quad():
    anim = AnimationKeyframes(
        times=[0.0, 1.0],
        transformations=[
            Transformation.make(translation=(0.0, 0.0, 0.0)),
            Transformation.make(translation=(0.5, 0.0, 0.0)),
        ])
    scene = _quad_scene(animation=anim)
    static = SceneStatic.from_scene(scene)
    w = h = 32
    cam = make_camera(transformation=from_lookat((0, 0, 2), (0, 0, 0)),
                      vfov_deg=60.0, width=w, height=h)
    gt = get_ground_truth(scene, static, cam, CameraConfig(), w, h,
                          t=0.5, t_prev=0.0, t_next=1.0,
                          aovs=("hit_mask", "world_flow_prev",
                                "world_flow_next", "pixel_flow_next"))
    c = (h // 2, w // 2)
    assert np.asarray(gt["hit_mask"])[c] == 1.0
    # the quad moves +x at 0.5 units/s: world flow to next (t=1.0) = +0.25 x
    np.testing.assert_allclose(np.asarray(gt["world_flow_next"])[c],
                               [0.25, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt["world_flow_prev"])[c],
                               [-0.25, 0, 0], atol=1e-4)
    # pixel flow: +x world motion moves the image point right (+px)
    pf = np.asarray(gt["pixel_flow_next"])[c]
    assert pf[0] > 1.0 and abs(pf[1]) < 1e-3
