"""Export the city_many_lights bench scene for the REFERENCE build
(parity/src/parity_city.cpp) so BASELINE.json gets a measured reference-CPU
paths/s denominator for config 5 and a radiance-parity golden (VERDICT
round-4 missing #3).

Assets written to parity/assets/city/:
  city_night.obj/.mtl  - the EXACT round-trip OBJ the bench scene is built
                         from (city_night writes it during its own round
                         trip; we pass workdir so it lands here verbatim)
  city_rgl_sphere.obj  - the post-roundtrip measured-RGL sphere, transform
                         baked (importGeometry on the reference side)
  city_rgl.bsdf        - the synthetic RGL table as a powitacq 'tensor_file'
                         (powitacq_rgb.inl:729-801 container; BRDF ctor
                         field checks :895-945)
  city_sky.tgdshim     - the night-sky equirect radiance image
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "parity"))
import tgdshim

OUT = os.path.join(REPO, "parity", "assets", "city")


def write_tensor_file(path: str, fields: dict) -> None:
    """Inverse of materials.rgl.read_tensor_file: the RGL 'tensor_file'
    container (header, field table, raw data; powitacq_rgb.inl:729-801)."""
    # powitacq Tensor::Type codes (powitacq_rgb.inl:639-652): UInt8=1,
    # Float32=10 — NOT the tgdshim codes.
    dtype_code = {np.dtype(np.uint8): 1, np.dtype(np.float32): 10}
    names = list(fields)
    # layout: header | field table | data blobs
    header = b"tensor_file\x00" + bytes([1, 0]) + struct.pack("<I", len(names))
    table_len = 0
    for name in names:
        arr = np.asarray(fields[name])
        table_len += 2 + len(name.encode()) + 3 + 8 + 8 * arr.ndim
    offset = len(header) + table_len
    table = b""
    data = b""
    for name in names:
        arr = np.ascontiguousarray(fields[name])
        nb = name.encode()
        table += struct.pack("<H", len(nb)) + nb
        table += struct.pack("<HB", arr.ndim, dtype_code[arr.dtype])
        table += struct.pack("<Q", offset)
        table += struct.pack(f"<{arr.ndim}Q", *arr.shape)
        offset += arr.nbytes
        data += arr.tobytes()
    with open(path, "wb") as f:
        f.write(header + table + data)


def main():
    os.makedirs(OUT, exist_ok=True)
    from wurblpt_tpu.core.transform import Transformation
    from wurblpt_tpu.io.obj import export_scene_to_obj
    from wurblpt_tpu.scene import generator as G
    from wurblpt_tpu.scene.builder import Lambertian, Mesh, MeshInstance, Scene
    from wurblpt_tpu.utils import scenes

    seed = 7
    # 1. main scene OBJ: city_night round-trips through OBJ during build;
    # pointing workdir here makes the bench scene and the reference twin
    # consume the IDENTICAL file.
    scenes.city_night(seed=seed, workdir=OUT)
    assert os.path.exists(os.path.join(OUT, "city_night.obj"))

    # 2. RGL sphere geometry with the bench transform baked
    # (utils/scenes.py city_night post-roundtrip extras). The fbm phases are
    # the first 8 draws of RandomState(seed) — reproduced here.
    rs = np.random.RandomState(seed)
    phases = [(rs.uniform(0, 2 * np.pi), rs.uniform(0, 2 * np.pi))
              for _ in range(4)]

    def fbm(x, z):
        out = 0.0
        for octave, (px, pz) in enumerate(phases):
            f = 0.12 * (2.0 ** octave)
            a = 0.9 * (0.5 ** octave)
            out = out + a * np.sin(f * x + px) * np.cos(f * z + pz)
        return out

    sph_scene = Scene()
    dummy = sph_scene.take_material(Lambertian(albedo=(0.5, 0.5, 0.5)))
    mesh = G.generate_sphere(1.0, slices=32, stacks=32)
    tf = Transformation.make(translation=(0.0, float(fbm(0.0, 4.0)) + 1.6, 4.0),
                             scale=(1.2, 1.2, 1.2))
    sph_scene.take_mesh_instance(MeshInstance(mesh, dummy, tf))
    export_scene_to_obj(sph_scene, os.path.join(OUT, "city_rgl_sphere.obj"))

    # 3. RGL table as a powitacq tensor file (fields exactly as the bench
    # scene builds them, utils/scenes.py city_night).
    T = 4

    def _smooth_positive(shape, s, lo=0.05, hi=1.0):
        rs3 = np.random.RandomState(s)
        a = rs3.uniform(lo, hi, shape).astype(np.float32)
        for ax in range(a.ndim):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return a.astype(np.float32)

    rgb = _smooth_positive((1, T, 3, 8, 8), seed + 15)
    fields = dict(
        description=np.frombuffer(b"wurblpt_tpu city parity table",
                                  np.uint8).copy(),
        phi_i=np.zeros((1,), np.float32),
        theta_i=np.linspace(0.0, np.pi / 2, T).astype(np.float32),
        ndf=_smooth_positive((16, 16), seed + 11),
        sigma=_smooth_positive((16, 16), seed + 12, 0.2, 0.4),
        vndf=_smooth_positive((1, T, 16, 16), seed + 13),
        luminance=_smooth_positive((1, T, 8, 8), seed + 14),
        rgb=rgb,
        jacobian=np.zeros((1,), np.uint8),
    )
    bsdf_path = os.path.join(OUT, "city_rgl.bsdf")
    write_tensor_file(bsdf_path, fields)
    # round-trip through OUR parser to validate the container
    from wurblpt_tpu.materials.rgl import read_tensor_file

    back = read_tensor_file(bsdf_path)
    for k in ("phi_i", "theta_i", "ndf", "sigma", "vndf", "luminance", "rgb"):
        np.testing.assert_array_equal(back[k], fields[k]), k

    # 4. night sky equirect. Flipped vertically for the reference: our
    # EnvironmentMapEquiRect convention puts numpy row 0 at the zenith
    # (PIL/picture row order), while the reference's v = asin(y)/pi + 0.5
    # (envmap.hpp:233,245) reads the zenith from the LAST stored TGD row.
    night = (scenes.procedural_sky(sun_radiance=2.0) * 0.08).astype(np.float32)
    tgdshim.save(os.path.join(OUT, "city_sky.tgdshim"), night[::-1].copy())
    print("city parity assets written to", OUT)


if __name__ == "__main__":
    main()
