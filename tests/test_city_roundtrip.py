"""city_night composition scene (BASELINE config 5 stand-in): the OBJ/MTL
round trip must preserve geometry scale, emissive hot spots, and the
power-weighted pick tables; RGL + envmap attach after import."""

import numpy as np

from wurblpt_tpu.utils import scenes


def _small(**kw):
    return scenes.city_night(terrain_res=60, n_buildings=24, n_windows=66,
                             sphere_slices=8, **kw)


def test_city_roundtrip_preserves_lights_and_scale():
    direct = _small(obj_roundtrip=False).build(use_bvh=False)
    rt = _small(obj_roundtrip=True).build(use_bvh=False)

    # 66 window quads -> 132 hot-spot triangles either way
    assert direct.n_lights == 132
    assert rt.n_lights == 132
    # geometry survives the round trip (same tris; RGL sphere added after)
    assert rt.n_tris == direct.n_tris
    # power-weighted alias table present and normalized, with real spread
    w = np.asarray(rt.light_weights)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    assert w.max() / w.min() > 5.0
    # the RGL table and material survive the post-import attach
    assert rt.rgl is not None and int(np.asarray(rt.rgl.n_tables)) >= 1 \
        if hasattr(rt.rgl, "n_tables") else rt.rgl is not None
    assert int(np.asarray(rt.materials.rgl_id).max()) >= 0
    # night-sky envmap with importance tables
    assert int(rt.envmap.kind) == 1
    assert rt.envmap.alias_prob.shape[0] > 0


def test_city_bounds_match_after_roundtrip():
    direct = _small(obj_roundtrip=False).build(use_bvh=False)
    rt = _small(obj_roundtrip=True).build(use_bvh=False)
    for arr_d, arr_r in ((direct.tris.p0, rt.tris.p0),):
        d = np.asarray(arr_d)
        r = np.asarray(arr_r)
        np.testing.assert_allclose(d.min(0), r.min(0), atol=1e-3)
        np.testing.assert_allclose(d.max(0), r.max(0), atol=1e-3)
