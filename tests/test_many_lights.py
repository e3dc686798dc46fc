"""Power-proportional light picking + O(1) per-light MIS (SURVEY section 7
"NEE cost model"): alias-table distribution, weighted mixture pdf, per-light
pdf identities, and estimator consistency across all three sampling modes.
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
    _, _, _, pick, _ = lights_sample(scene, origin, u3)
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


def test_per_light_pdf_matches_mixture_single_light():
    """With ONE light the per-light machinery must reproduce the mixture pdf
    exactly: pick_prob=1 and pdf_sa == lights_pdf_sum for the sampled
    direction, and lights_pdf_at_hit == the mixture pdf for a ray that hits
    the light."""
    from wurblpt_tpu.render.intersect import scene_raw_hit
    from wurblpt_tpu.render.lights import (light_pick_prob_of,
                                           lights_pdf_at_hit)

    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(2.0, 2.0), material=B.Lambertian(albedo=(0.7,) * 3)))
    sc.take_sphere(B.SphereObject((0.5, 1.0, 2.0), 0.3,
                                  B.LightDiffuse(radiance=(5.0,) * 3)),
                   hot_spot=True)
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(0.6, 0.6),
        material=B.LightDiffuse(radiance=(9.0,) * 3),
        transformation=B.Transformation.make(translation=(-1.0, 0.5, 2.0))),
        hot_spot=True)
    scene = sc.build()
    assert scene.prim_light_pick is not None

    n = 4096
    rng = np.random.default_rng(2)
    u3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
    origin = jnp.tile(jnp.asarray([[0.1, -0.3, 0.2]]), (n, 1))
    ldir, lprim, ldist, lpick, pdf_sa = lights_sample(scene, origin, u3)

    # identity 1: pick_prob * pdf_sa equals the picked light's term of the
    # mixture; summing over picks reconstructs the mixture in expectation --
    # check directly per-lane: evaluate the mixture and subtract the OTHER
    # light's pdf contribution.
    from wurblpt_tpu.render.lights import lights_pdf_multi, light_pick_probs
    per = np.asarray(light_pick_prob_of(scene, lpick) * pdf_sa)
    assert (per > 0).mean() > 0.99

    # identity 2: for rays that actually hit a light, lights_pdf_at_hit must
    # equal pick_prob(that light) x its solid-angle pdf; cross-check against
    # the mixture minus the other light (geometrically separated lights ->
    # only one term is nonzero per direction here).
    t, prim, _, _ = scene_raw_hit(scene, origin, ldir,
                                  jnp.full((n,), 1e-4), jnp.full((n,), 3e37))
    from wurblpt_tpu.render.intersect import assemble_hit
    hr = assemble_hit(scene, origin, ldir, t, prim, jnp.zeros((n,)), jnp.zeros((n,)))
    hit_light = np.isin(np.asarray(prim), np.asarray(scene.light_prims))
    assert hit_light.mean() > 0.8  # NEE rays mostly reach their light
    lp_hit = np.asarray(lights_pdf_at_hit(scene, origin, ldir, t, prim,
                                          hr.geom_normal))
    mix = np.asarray(lights_pdf_sum(scene, origin, ldir))
    w = np.asarray(light_pick_probs(scene))
    sel = hit_light & (np.asarray(prim) == np.asarray(scene.light_prims)[np.asarray(lpick)])
    # directions toward one light never graze the other in this layout, so
    # mixture == per-light term there
    np.testing.assert_allclose(lp_hit[sel], mix[sel], rtol=2e-3)
    np.testing.assert_allclose(lp_hit[sel], per[sel], rtol=2e-3)


def test_per_light_estimator_matches_mixture_estimator():
    """Per-light MIS (O(1)) is a weight change, NOT a bias change: the
    rendered mean of a many-light scene must agree with the mixture-MIS
    render within Monte-Carlo noise."""
    radiances = tuple(float(2.0 * (1.8 ** i)) for i in range(9))
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(3.0, 3.0),
        material=B.Lambertian(albedo=(0.7,) * 3)))
    for i, r in enumerate(radiances):
        sc.take_sphere(B.SphereObject((-2.0 + 0.5 * i, 1.2, 1.5), 0.15,
                                      B.LightDiffuse(radiance=(r,) * 3)),
                       hot_spot=True)
    scene = sc.build()
    static = SceneStatic.from_scene(scene)
    assert static.per_light_mis  # 9 static lights -> per-light path on

    w = h = 32
    cam = make_camera(transformation=from_lookat((0, 0.6, 3.2), (0, 0, 0)),
                      vfov_deg=50.0, width=w, height=h)
    params = RenderParams(max_path_components=3)
    imgs = {}
    for tag, st in (("per_light", static),
                    ("mixture", static._replace(per_light_mis=False))):
        fn = jax.jit(lambda s, c, _st=st: render_frame(
            s, _st, c, CameraConfig(), SensorRGB(), w, h, 6, params=params))
        imgs[tag] = np.asarray(fn(scene, cam))
    mp = imgs["per_light"].mean()
    mm = imgs["mixture"].mean()
    assert abs(mp - mm) / (mm + 1e-9) < 0.05, f"{mp} vs {mm}"


def test_uniform_light_sampling_opt_out():
    """build(light_sampling='uniform') must restore the reference's uniform
    pick exactly: no weight/alias tables attached (wurblpt.hpp:187), while
    the per-prim pick probs (for per-light MIS) become 1/L."""
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(2.0, 2.0), material=B.Lambertian(albedo=(0.7,) * 3)))
    for i, r in enumerate((2.0, 20.0, 200.0)):
        sc.take_sphere(B.SphereObject((-1.5 + 1.5 * i, 1.0, 2.0), 0.2,
                                      B.LightDiffuse(radiance=(r,) * 3)),
                       hot_spot=True)
    scene = sc.build(light_sampling="uniform")
    assert scene.light_weights is None
    assert scene.light_alias_prob is None
    pp = np.asarray(scene.prim_light_pick)
    lp = np.asarray(scene.light_prims)
    np.testing.assert_allclose(pp[lp], 1.0 / 3.0)
    import pytest

    with pytest.raises(ValueError):
        sc.build(light_sampling="nonsense")
