"""Gradient correctness: autodiff vs central finite differences.

Differentiability is the framework's flagship capability beyond the reference
(SURVEY.md section 0: the reference has no autodiff), so the detached-sampling
estimator must be validated, not assumed (VERDICT round 1 item 3).

The counter-based RNG makes every render a DETERMINISTIC function of the scene
parameters (common random numbers), so central differences of the same render
are a faithful derivative of the sampled estimator; away from discrete-decision
flips it must agree with reverse-mode through the fori_loop integrator.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wurblpt_tpu import (
    CameraConfig,
    RenderParams,
    SceneStatic,
    SensorRGB,
    make_camera,
)
from wurblpt_tpu.core.transform import from_lookat
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.utils import scenes

PARAMS = RenderParams(max_path_components=4, differentiable=True)


def _cornell_setup(w=24, h=24):
    arrays = scenes.cornell_box_ref().build()
    static = SceneStatic.from_scene(arrays)
    pose, vfov = scenes.cornell_ref_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=w, height=h)
    return arrays, static, cam, w, h


def _render_loss(arrays, static, cam, w, h, weights=None):
    img = render_frame(arrays, static, cam, CameraConfig(), SensorRGB(),
                       w, h, 2, params=PARAMS)
    if weights is None:
        return jnp.mean(img)
    return jnp.sum(img * weights)


def test_grad_albedo_furnace_analytic():
    """Furnace: image = albedo * E exactly, so d(mean)/d(albedo) = E on the
    sphere footprint — autodiff must reproduce the ANALYTIC derivative."""
    arrays = scenes.furnace(albedo=0.5, env_radiance=1.0).build()
    static = SceneStatic.from_scene(arrays)
    pose = from_lookat((0, 0, 4), (0, 0, 0))
    w = h = 16
    cam = make_camera(transformation=pose, vfov_deg=30, width=w, height=h)
    params = RenderParams(max_path_components=4, differentiable=True,
                          randomize_ray_over_pixel=False)

    def loss(albedo_scalar):
        mats = arrays.materials._replace(
            albedo=jnp.full_like(arrays.materials.albedo, albedo_scalar))
        sc = arrays._replace(materials=mats)
        img = render_frame(sc, static, cam, CameraConfig(), SensorRGB(),
                           w, h, 2, params=params)
        # central pixels view the sphere head-on: value = albedo * E exactly
        return jnp.mean(img[6:10, 6:10])

    g = jax.grad(loss)(jnp.float32(0.5))
    eps = 1e-2
    fd = (loss(jnp.float32(0.5 + eps)) - loss(jnp.float32(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
    # analytic: d(albedo * E)/d(albedo) = E = 1 on every center pixel
    np.testing.assert_allclose(float(g), 1.0, rtol=2e-2)


def test_grad_emissive_linear():
    """Radiance is LINEAR in light emissive power: FD must match autodiff to
    float precision, and the derivative at s=1 must equal the image mean
    contributed by light-carrying paths."""
    arrays, static, cam, w, h = _cornell_setup()
    base = arrays.materials.emissive

    def loss(s):
        sc = arrays._replace(materials=arrays.materials._replace(emissive=base * s))
        return _render_loss(sc, static, cam, w, h)

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(1 + eps))) - float(loss(jnp.float32(1 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-3)
    # linearity: loss(s) = s * loss(1) (every path carries emissive^1)
    np.testing.assert_allclose(g, float(loss(jnp.float32(1.0))), rtol=1e-3)


def test_grad_wall_albedo_fd():
    """d(loss)/d(white albedo) via reverse-mode vs central differences."""
    arrays, static, cam, w, h = _cornell_setup()
    base = arrays.materials.albedo
    # material 0 is "white" (first take_material call in cornell_box_ref)
    sel = jnp.zeros_like(base).at[0, :3].set(1.0)

    def loss(s):
        sc = arrays._replace(materials=arrays.materials._replace(
            albedo=base + sel * s))
        return _render_loss(sc, static, cam, w, h)

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 5e-3
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert g > 0.0  # brighter walls -> brighter image
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_grad_camera_translation_fd():
    """d(loss)/d(camera height) via reverse-mode vs central differences, on an
    EDGE-FREE view (a single lit floor quad fills the frame) so the sampled
    estimator is smooth in the camera pose and FD is trustworthy — near
    geometric edges the per-path estimator is a step function and FD measures
    the flips, not the derivative."""
    from wurblpt_tpu.scene.builder import (
        Lambertian, LightDiffuse, MeshInstance, Scene, SphereObject,
    )
    from wurblpt_tpu.scene import generator as G
    from wurblpt_tpu.core.transform import Transformation, quat_from_axis_angle

    scene = Scene()
    floor = scene.take_material(Lambertian(albedo=(0.6, 0.5, 0.4)))
    mesh = G.generate_quad(50.0, 50.0)
    tf = Transformation.make(rotation=quat_from_axis_angle(
        np.array([1.0, 0.0, 0.0], np.float32), -np.pi / 2))
    scene.take_mesh_instance(MeshInstance(mesh, floor, tf))
    light = scene.take_material(LightDiffuse(radiance=(30.0, 30.0, 30.0)))
    scene.take_sphere(SphereObject((0.0, 6.0, 0.0), 1.0, light), hot_spot=True)

    arrays = scene.build()
    static = SceneStatic.from_scene(arrays)
    w = h = 12
    pose = from_lookat((0.0, 2.0, 0.01), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=50, width=w, height=h)

    def loss(dy):
        t = cam.transformation
        t2 = t._replace(translation=t.translation + jnp.array([0.0, 1.0, 0.0]) * dy)
        cam2 = cam._replace(transformation=t2)
        return _render_loss(arrays, static, cam2, w, h)

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 1e-3
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.08, atol=1e-4)
