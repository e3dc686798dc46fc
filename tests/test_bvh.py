"""BVH build + traversal: exact parity with the brute-force reference path.

Mirrors the reference's implicit BVH validation (the same scenes render
identically with and without acceleration; ``libwurblpt/bvh.hpp``): the
threaded-tree traversal must return the *same* closest hit (prim id, t, u, v)
as the dense primitive sweep for every ray.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wurblpt_tpu.accel.build import build_bvh_arrays, prim_aabbs, _build_native, _build_numpy
from wurblpt_tpu.accel.traverse import bvh_closest_hit
from wurblpt_tpu.render.intersect import scene_raw_hit
from wurblpt_tpu.utils import scenes


def _random_soup(seed, n_tri, n_sph):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.15, 0.15, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.15, 0.15, (n_tri, 3)).astype(np.float32)
    sc = rng.uniform(-1, 1, (n_sph, 3)).astype(np.float32)
    sr = rng.uniform(0.02, 0.1, (n_sph,)).astype(np.float32)
    return p0, e1, e2, sc, sr


def _scene_with(p0, e1, e2, sc, sr, bvh):
    from wurblpt_tpu.scene.ir import (
        AnimTable, MaterialTable, SceneArrays, Spheres, TextureTable, Triangles,
        empty_envmap,
    )

    T = p0.shape[0]
    S = sc.shape[0]
    z2 = jnp.zeros((T, 2))
    z3 = jnp.zeros((T, 3))
    zi = jnp.zeros((T,), jnp.int32)
    tris = Triangles(jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
                     z3, z3, z3, z2, z2, z2, z3, z3, z3, zi, zi, zi)
    sph = Spheres(jnp.asarray(sc), jnp.asarray(sr),
                  jnp.zeros((S,), jnp.int32), jnp.zeros((S,), jnp.int32))
    mt = MaterialTable(
        typ=jnp.zeros((1,), jnp.int32), flags=jnp.zeros((1,), jnp.int32),
        albedo=jnp.zeros((1, 4)), albedo_tex=-jnp.ones((1,), jnp.int32),
        emissive=jnp.zeros((1, 4)), emissive_tex=-jnp.ones((1,), jnp.int32),
        p0=jnp.zeros((1, 4)), p1=jnp.zeros((1, 4)),
        normal_tex=-jnp.ones((1,), jnp.int32), rgl_id=-jnp.ones((1,), jnp.int32),
        p2=jnp.zeros((1, 4)), opacity_tex=-jnp.ones((1,), jnp.int32),
    )
    tt = TextureTable(
        jnp.zeros((0,), jnp.int32), jnp.zeros((0, 8)), jnp.zeros((0, 2)),
        jnp.zeros((0, 2)), jnp.zeros((0, 4)), jnp.zeros((0, 4)),
        jnp.zeros((0,), jnp.int32), jnp.zeros((0, 1, 1, 4), jnp.float16),
        jnp.zeros((0, 2), jnp.int32),
    )
    an = AnimTable(jnp.zeros((1, 1)), jnp.zeros((1, 1, 3)),
                   jnp.array([[[0.0, 0.0, 0.0, 1.0]]]), jnp.ones((1, 1, 3)),
                   jnp.ones((1,), jnp.int32))
    from wurblpt_tpu.scene.ir import empty_media
    return SceneArrays(tris, sph, mt, tt, an, bvh, empty_envmap(),
                       jnp.zeros((0,), jnp.int32), empty_media())


def _rays(seed, n):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-4), jnp.full((n,), 3.0e37))


@pytest.mark.parametrize("n_tri,n_sph", [(500, 20), (41, 0), (0, 64)])
def test_bvh_matches_brute_force(n_tri, n_sph):
    p0, e1, e2, sc, sr = _random_soup(3, n_tri, n_sph)
    bvh = build_bvh_arrays((p0, e1, e2), (sc, sr))
    scene_b = _scene_with(p0, e1, e2, sc, sr, bvh)
    scene_n = scene_b._replace(bvh=None)
    o, d, tmin, tmax = _rays(4, 2048)

    t1, pr1, u1, v1 = (np.asarray(x) for x in scene_raw_hit(scene_n, o, d, tmin, tmax))
    t2, pr2, u2, v2 = (np.asarray(x) for x in bvh_closest_hit(scene_b, o, d, tmin, tmax))
    np.testing.assert_array_equal(pr1 >= 0, pr2 >= 0)
    both = (pr1 >= 0) & (pr2 >= 0)
    np.testing.assert_array_equal(pr1[both], pr2[both])
    np.testing.assert_allclose(t1[both], t2[both], atol=1e-4)
    np.testing.assert_allclose(u1[both], u2[both], atol=1e-4)
    np.testing.assert_allclose(v1[both], v2[both], atol=1e-4)


def test_numpy_builder_matches_native_traversal_results():
    """Both builders must produce trees that traverse to identical hits
    (layouts may differ; results may not)."""
    p0, e1, e2, sc, sr = _random_soup(11, 300, 10)
    amin, amax, cent = prim_aabbs((p0, e1, e2), (sc, sr))
    nat = _build_native(amin, amax, cent, 4)
    assert nat is not None, "native builder must compile in this environment"
    from wurblpt_tpu.accel.build import pack_bvh

    npb = _build_numpy(amin, amax, cent, 4)
    o, d, tmin, tmax = _rays(7, 1024)
    results = []
    for built in (nat, npb):
        bvh = pack_bvh(built, 4)
        scene = _scene_with(p0, e1, e2, sc, sr, bvh)
        t, pr, u, v = bvh_closest_hit(scene, o, d, tmin, tmax)
        results.append((np.asarray(t), np.asarray(pr)))
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-5)


def test_cornell_renders_identically_with_bvh():
    """End-to-end: forcing the BVH on the Cornell box must not change the image
    (bit-exact RNG + same hit results => allclose)."""
    from wurblpt_tpu import SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.render.integrator import RenderParams, render_frame
    from wurblpt_tpu.render.camera import CameraConfig

    pose, vfov = scenes.cornell_camera()
    img = []
    for use_bvh in (False, True):
        scene = scenes.cornell_box().build(use_bvh=use_bvh)
        assert (scene.bvh is not None) == use_bvh
        static = SceneStatic.from_scene(scene)
        cam = make_camera(transformation=pose, vfov_deg=vfov, width=24, height=24)
        out = render_frame(
            scene, static, cam, CameraConfig(), SensorRGB(), 24, 24, 2,
            params=RenderParams(max_path_components=4),
        )
        img.append(np.asarray(out))
    np.testing.assert_allclose(img[0], img[1], atol=2e-3)


def test_wide_traversal_compaction_stages_match_binary():
    """65536 rays force the wide traversal through its full live-lane
    compaction schedule (stages 65536 -> 16384 -> 4096 -> 1024, walker-count
    walk exits, small-stage unroll, scatter-back of results); the earlier
    tests' <=2048-ray batches run single-stage and never touch that
    machinery. Results must be identical to the binary threaded walk."""
    import os

    p0, e1, e2, sc, sr = _random_soup(11, 9000, 400)
    bvh_w = build_bvh_arrays((p0, e1, e2), (sc, sr))
    assert bvh_w.wide_nodes is not None
    os.environ["WURBLPT_BVH_WIDE"] = "0"
    try:
        bvh_b = build_bvh_arrays((p0, e1, e2), (sc, sr))
    finally:
        os.environ.pop("WURBLPT_BVH_WIDE")
    assert bvh_b.wide_nodes is None
    scene_w = _scene_with(p0, e1, e2, sc, sr, bvh_w)
    scene_b = _scene_with(p0, e1, e2, sc, sr, bvh_b)

    o, d, tmin, tmax = _rays(13, 65536)
    t_w, p_w, u_w, v_w = bvh_closest_hit(scene_w, o, d, tmin, tmax)
    t_b, p_b, u_b, v_b = bvh_closest_hit(scene_b, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_b))
    hit = np.asarray(p_b) >= 0
    assert hit.mean() > 0.15
    np.testing.assert_allclose(np.asarray(t_w)[hit], np.asarray(t_b)[hit],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u_w)[hit], np.asarray(u_b)[hit],
                               atol=1e-6)

    from wurblpt_tpu.accel.traverse import bvh_any_hit
    tmax2 = jnp.full(tmax.shape, 1.5)
    a_w = np.asarray(bvh_any_hit(scene_w, o, d, tmin, tmax2))
    a_b = np.asarray(bvh_any_hit(scene_b, o, d, tmin, tmax2))
    np.testing.assert_array_equal(a_w, a_b)
    assert 0.05 < a_w.mean() < 1.0
