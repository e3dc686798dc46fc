"""Inverse-rendering fit() loop: parameter recovery through the optimizer,
including the camera hook (round-2 noted camera gradients were computed but
never used — now they drive pose fitting)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
from wurblpt_tpu.core.transform import from_lookat
from wurblpt_tpu.inverse import fit
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.scene import builder as B
from wurblpt_tpu.scene.generator import generate_quad


def _scene(albedo=(0.3, 0.6, 0.4)):
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=generate_quad(1.5, 1.5), material=B.Lambertian(albedo=albedo)))
    sc.take_sphere(B.SphereObject((0.6, 1.0, 2.4), 0.3,
                                  B.LightDiffuse(radiance=(16.0,) * 3)),
                   hot_spot=True)
    return sc.build()


def test_fit_recovers_albedo():
    w = h = 24
    cam = make_camera(transformation=from_lookat((0, 0, 2.4), (0, 0, 0)),
                      vfov_deg=45.0, width=w, height=h)
    params = RenderParams(max_path_components=2)
    target_scene = _scene(albedo=(0.7, 0.2, 0.5))
    static = SceneStatic.from_scene(target_scene)
    target = render_frame(target_scene, static, cam, CameraConfig(),
                          SensorRGB(), w, h, 2, params=params)

    scene0 = _scene(albedo=(0.4, 0.4, 0.4))

    def apply_params(scene, p):
        alb = scene.materials.albedo.at[0, :3].set(p["albedo"])
        return scene._replace(materials=scene.materials._replace(albedo=alb))

    import optax

    res = fit(scene0, {"albedo": jnp.asarray([0.4, 0.4, 0.4])}, apply_params,
              jnp.asarray(target), cam=cam, width=w, height=h,
              samples_sqrt=2, render_params=params,
              optimizer=optax.adam(5e-2), steps=40)
    got = np.asarray(res.params["albedo"])
    np.testing.assert_allclose(got, [0.7, 0.2, 0.5], atol=0.06)
    assert res.losses[-1] < 0.25 * res.losses[0]


def test_fit_recovers_camera_translation():
    """apply_cam hook: recover a lateral camera offset from pixels."""
    w = h = 24
    true_cam = make_camera(
        transformation=from_lookat((0.25, -0.1, 2.4), (0.25, -0.1, 0)),
        vfov_deg=45.0, width=w, height=h)
    params = RenderParams(max_path_components=2)
    scene = _scene()
    static = SceneStatic.from_scene(scene)
    target = render_frame(scene, static, true_cam, CameraConfig(),
                          SensorRGB(), w, h, 2, params=params)

    cam0 = make_camera(transformation=from_lookat((0.0, 0.0, 2.4), (0, 0, 0)),
                       vfov_deg=45.0, width=w, height=h)

    def apply_cam(cam, p):
        tf = cam.transformation
        return cam._replace(transformation=tf._replace(
            translation=tf.translation + p["dt"]))

    import optax

    res = fit(scene, {"dt": jnp.zeros(3)}, lambda s, p: s,
              jnp.asarray(target), cam=cam0, width=w, height=h,
              samples_sqrt=2, render_params=params, apply_cam=apply_cam,
              optimizer=optax.adam(2e-2), steps=60)
    dt = np.asarray(res.params["dt"])
    np.testing.assert_allclose(dt[:2], [0.25, -0.1], atol=0.06)
    assert res.losses[-1] < 0.3 * res.losses[0]
