"""OBJ/MTL import/export (import.hpp:206-588, scene.hpp:215-240)."""

import os
import textwrap

import numpy as np
import pytest

from wurblpt_tpu.io.obj import (
    ImportBits,
    _parse_native,
    _parse_python,
    export_scene_to_obj,
    import_geometry,
    import_into_scene,
    load_obj_raw,
)
from wurblpt_tpu.scene import builder as B


OBJ = textwrap.dedent("""\
    mtllib test.mtl
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    vt 0 0
    vt 1 0
    vt 1 1
    vt 0 1
    vn 0 0 1
    usemtl diffuse_red
    f 1/1/1 2/2/1 3/3/1 4/4/1
    usemtl shiny
    f -4//-1 -3//-1 -2//-1
    usemtl glassy
    f 1 2 3
    usemtl lamp
    f 1/1/1 3/3/1 4/4/1
""")

MTL = textwrap.dedent("""\
    newmtl diffuse_red
    Kd 0.8 0.1 0.1
    Ks 0 0 0

    newmtl shiny
    Kd 0.3 0.3 0.3
    Ks 0.6 0.6 0.6
    Ns 64

    newmtl glassy
    Kd 0.9 0.9 1.0
    Ni 1.52
    d 0.1

    newmtl lamp
    Kd 0 0 0
    Ke 5 5 5
""")


@pytest.fixture()
def obj_file(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    return str(tmp_path / "test.obj")


def test_parsers_agree(obj_file):
    nat = _parse_native(obj_file)
    py = _parse_python(obj_file)
    assert nat is not None, "native parser must build in this environment"
    np.testing.assert_allclose(nat.v, py.v)
    np.testing.assert_allclose(nat.vt, py.vt)
    np.testing.assert_allclose(nat.vn, py.vn)
    np.testing.assert_array_equal(nat.fv, py.fv)
    np.testing.assert_array_equal(nat.fn, py.fn)
    np.testing.assert_array_equal(nat.ft, py.ft)
    np.testing.assert_array_equal(nat.fmat, py.fmat)
    assert len(nat.materials) == len(py.materials) == 4
    for a, b in zip(nat.materials, py.materials):
        assert a["name"] == b["name"]
        np.testing.assert_allclose(a["kd"], b["kd"])
        assert a["ni"] == b["ni"]


def test_parse_semantics(obj_file):
    raw = load_obj_raw(obj_file)
    # 1 quad (2 tris) + 1 tri (negative idx) + 1 tri (no vt/vn) + 1 tri = 5.
    assert raw.fv.shape == (5, 3)
    # Quad fan: (0,1,2), (0,2,3).
    np.testing.assert_array_equal(raw.fv[0], [0, 1, 2])
    np.testing.assert_array_equal(raw.fv[1], [0, 2, 3])
    # Negative indices resolve to the same quad verts.
    np.testing.assert_array_equal(raw.fv[2], [0, 1, 2])
    assert raw.fn[2, 0] == 0
    # Bare 'f 1 2 3': no vt/vn.
    assert raw.ft[3, 0] == -1 and raw.fn[3, 0] == -1
    assert raw.fmat.tolist() == [0, 0, 1, 2, 3]


def test_import_heuristics(obj_file):
    sc = B.Scene()
    n = import_into_scene(sc, obj_file, import_bits=ImportBits.WITH_GLASS)
    assert n == 4
    mats = {type(m).__name__ for m in sc._materials}
    assert "Lambertian" in mats       # diffuse_red
    assert "ModPhong" in mats         # shiny (specular) + lamp (emissive)
    assert "Glass" in mats            # glassy (d < 1, WITH_GLASS)
    # The lamp instance is registered as a hot spot.
    hot = [h for _, h in sc._instances]
    assert sum(hot) == 1
    # Builds into arrays and has one light prim.
    arrays = sc.build()
    assert arrays.light_prims.shape[0] >= 1


def test_import_geometry(obj_file):
    meshes = import_geometry(obj_file)
    assert len(meshes) == 4
    assert all(m.positions.shape[1] == 3 for m in meshes)


def test_export_import_roundtrip(tmp_path):
    from wurblpt_tpu.scene.generator import generate_cube

    sc = B.Scene()
    sc.take_material(B.Lambertian(albedo=(0.7, 0.2, 0.2)), name="red")
    sc.take_mesh_instance(B.MeshInstance(mesh=generate_cube(1.0), material="red"))
    sc.take_sphere(B.SphereObject(center=(3, 0, 0), radius=1.0,
                                  material=B.ModPhong(diffuse=(0.2, 0.6, 0.2))))
    out = str(tmp_path / "exported.obj")
    export_scene_to_obj(sc, out)
    assert os.path.exists(out) and os.path.exists(str(tmp_path / "exported.mtl"))

    sc2 = B.Scene()
    n = import_into_scene(sc2, out)
    assert n >= 2
    arrays = sc2.build()
    # Cube: 12 tris; sphere tessellated into many.
    assert arrays.n_tris > 12
    # Re-imported diffuse color round-trips.
    reds = [m for m in sc2._materials if isinstance(m, B.Lambertian)
            and np.allclose(np.asarray(m.albedo)[:3], (0.7, 0.2, 0.2), atol=1e-3)]
    assert reds


def test_bump_to_normal_map():
    from wurblpt_tpu.io.obj import bump_to_normal_map

    # Flat height -> straight-up normals (0.5, 0.5, 1).
    nm = bump_to_normal_map(np.full((8, 8), 0.3, np.float32))
    np.testing.assert_allclose(nm[..., 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(nm[..., 0], 0.5, atol=1e-6)
    # A horizontal ramp tilts normals along -x.
    ramp = np.tile(np.linspace(0, 1, 16, dtype=np.float32), (8, 1))
    nm = bump_to_normal_map(ramp)
    assert nm[4, 8, 0] < 0.5


def test_export_import_textured_roundtrip(tmp_path):
    """Textured materials survive the OBJ/MTL round trip: the exporter writes
    the texture as a PNG (texture.hpp:47-158 export protocol) and the importer
    reloads it with matching texel values."""
    from wurblpt_tpu.scene.generator import generate_quad

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:4, :, 0] = 1.0     # top half red
    tex[4:, :, 2] = 1.0     # bottom half blue
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=generate_quad(1.0, 1.0),
        material=B.Lambertian(albedo=B.ImageTexture(image=tex, srgb=False))))
    out = str(tmp_path / "textured.obj")
    export_scene_to_obj(sc, out)
    pngs = [p for p in os.listdir(str(tmp_path)) if p.endswith(".png")]
    assert pngs, "exporter must write the texture image"

    sc2 = B.Scene()
    import_into_scene(sc2, out)
    arrays = sc2.build()
    # the imported material carries an image texture...
    assert arrays.textures.img_data.shape[0] >= 1
    # ...and sampling reproduces the halves (allow sRGB encode/decode slack)
    import jax.numpy as jnp
    from wurblpt_tpu.render.texture import sample_texture

    tex_id = int(np.asarray(arrays.materials.albedo_tex).max())
    assert tex_id >= 0
    uv = jnp.asarray([[0.5, 0.75], [0.5, 0.25]], jnp.float32)  # top / bottom
    vals = np.asarray(sample_texture(
        arrays.textures, jnp.full((2,), tex_id, jnp.int32), uv))
    assert vals[0, 0] > 0.8 and vals[0, 2] < 0.2   # red half
    assert vals[1, 2] > 0.8 and vals[1, 0] < 0.2   # blue half


def test_export_writes_tf_for_opaque_materials(tmp_path):
    """Opaque exports MUST carry 'Tf 1 1 1': tinyobj defaults Tf to 0 and the
    reference's transmittance fixup (import.hpp:303-306) reads a Tf-less
    'd 1' material as FULLY TRANSPARENT — round-5 city-twin finding that
    invalidated the round-4 OBJ-scene CPU baselines."""
    from wurblpt_tpu.io.obj import export_scene_to_obj
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene import generator as G

    sc = B.Scene()
    for mat in (B.Lambertian(albedo=(0.3, 0.4, 0.5)),
                B.ModPhong(diffuse=(0.5, 0.5, 0.5), specular=(0.1, 0.1, 0.1),
                           shininess=30.0),
                B.GGX(albedo=(0.6, 0.6, 0.6), roughness=0.2),
                B.Mirror(),
                B.LightDiffuse(radiance=(5.0, 5.0, 5.0))):
        sc.take_mesh_instance(B.MeshInstance(G.generate_quad(1.0, 1.0),
                                             sc.take_material(mat)))
    out = tmp_path / "tf.obj"
    export_scene_to_obj(sc, str(out))
    mtl = (tmp_path / "tf.mtl").read_text()
    blocks = [b for b in mtl.split("newmtl") if b.strip()]
    assert len(blocks) == 5
    for b in blocks:
        assert "Tf 1 1 1" in b, f"material block lacks Tf:\n{b}"


def test_reference_transmittance_fixup_semantics(tmp_path):
    """With an EXPLICIT Tf < 1 and d 1, both importers apply the reference's
    fixup (opacity = mean(Tf), transmissive = 1 - Tf); with NO Tf line ours
    deliberately stays opaque (documented divergence at the fixup site)."""
    from wurblpt_tpu.io.obj import import_into_scene
    from wurblpt_tpu.scene import builder as B

    obj = tmp_path / "s.obj"
    (tmp_path / "s.mtl").write_text(
        "newmtl translucent\nKd 0.5 0.5 0.5\nKs 0.1 0.1 0.1\nNs 10\nd 1\n"
        "Tf 0.4 0.4 0.4\n\n"
        "newmtl plain\nKd 0.5 0.5 0.5\nKs 0.1 0.1 0.1\nNs 10\nd 1\n")
    obj.write_text(
        "mtllib s.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "usemtl translucent\nf 1 2 3\nusemtl plain\nf 1 2 3\n")
    sc = B.Scene()
    import_into_scene(sc, str(obj))
    mats = {getattr(m, "opacity", 1.0): m for m in sc._materials}
    opacities = sorted(float(o) if not isinstance(o, B.Texture) else 1.0
                       for o in mats)
    assert abs(opacities[0] - 0.4) < 1e-6      # translucent: mean(Tf)
    assert abs(opacities[-1] - 1.0) < 1e-6     # Tf-less: opaque (ours)
