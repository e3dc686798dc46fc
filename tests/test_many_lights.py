"""Power-proportional light picking (SURVEY section 7 "NEE cost model"):
alias-table distribution, weighted mixture pdf, and estimator consistency.
"""

import numpy as np

import jax
import jax.numpy as jnp

from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
from wurblpt_tpu.core.transform import from_lookat
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.render.lights import lights_pdf_sum, lights_sample
from wurblpt_tpu.scene import builder as B
from wurblpt_tpu.scene import generator as G


def _three_light_scene(radiances=(2.0, 20.0, 200.0)):
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(2.0, 2.0),
        material=B.Lambertian(albedo=(0.7,) * 3),
        transformation=B.Transformation.make(
            translation=(0, 0, 0))))
    for i, r in enumerate(radiances):
        sc.take_sphere(B.SphereObject((-1.5 + 1.5 * i, 1.0, 2.0), 0.2,
                                      B.LightDiffuse(radiance=(r,) * 3)),
                       hot_spot=True)
    return sc.build()


def test_alias_pick_matches_power_distribution():
    scene = _three_light_scene()
    w = np.asarray(scene.light_weights)
    # equal areas, radiance ratios 1:10:100 -> weights proportional
    np.testing.assert_allclose(w / w[0], [1.0, 10.0, 100.0], rtol=1e-4)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)

    n = 1 << 16
    rng = np.random.default_rng(0)
    u3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
    origin = jnp.tile(jnp.asarray([[0.0, 0.0, 0.5]]), (n, 1))
    _, _, _, pick = lights_sample(scene, origin, u3)
    counts = np.bincount(np.asarray(pick), minlength=3) / n
    np.testing.assert_allclose(counts, w, atol=4.0 / np.sqrt(n))


def test_uniform_powers_pick_uniformly():
    scene = _three_light_scene(radiances=(5.0, 5.0, 5.0))
    w = np.asarray(scene.light_weights)
    np.testing.assert_allclose(w, 1.0 / 3.0, rtol=1e-6)
    # alias probabilities are exactly 1 -> pick == floor(u*L), the uniform
    # pick of the reference (wurblpt.hpp:187)
    np.testing.assert_allclose(np.asarray(scene.light_alias_prob), 1.0)


def test_weighted_mixture_pdf_integrates_to_one():
    """sum over the sphere of the weighted mixture pdf must be ~1."""
    scene = _three_light_scene()
    n = 1 << 15
    rng = np.random.default_rng(1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origin = jnp.tile(jnp.asarray([[0.0, 0.0, 0.5]]), (n, 1))
    pdf = np.asarray(lights_pdf_sum(scene, origin, jnp.asarray(d)))
    integral = pdf.mean() * 4.0 * np.pi  # MC over uniform directions
    np.testing.assert_allclose(integral, 1.0, rtol=5e-2)


def test_weighted_estimator_matches_uniform_estimator():
    """Power-weighted picking is a variance change, NOT a bias change: the
    rendered mean must agree with the uniform-pick render."""
    scene_w = _three_light_scene()
    # uniform variant: strip the tables -> lights_sample falls back to the
    # reference's uniform pick and lights_pdf uses 1/L weights
    scene_u = scene_w._replace(light_weights=None, light_alias_prob=None,
                               light_alias_idx=None)
    w = h = 32
    cam = make_camera(transformation=from_lookat((0, 0.4, 3.0), (0, 0, 0)),
                      vfov_deg=50.0, width=w, height=h)
    params = RenderParams(max_path_components=2)

    imgs = {}
    for tag, sc in (("weighted", scene_w), ("uniform", scene_u)):
        static = SceneStatic.from_scene(sc)
        fn = jax.jit(lambda s, c, _st=static: render_frame(
            s, _st, c, CameraConfig(), SensorRGB(), w, h, 4, params=params))
        imgs[tag] = np.asarray(fn(sc, cam))
    mw = imgs["weighted"].mean()
    mu = imgs["uniform"].mean()
    assert abs(mw - mu) / (mu + 1e-9) < 0.08, f"{mw} vs {mu}"
