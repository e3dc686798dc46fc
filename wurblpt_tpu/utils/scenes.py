"""Canonical test/benchmark scenes.

`cornell_box` mirrors the hand-built scene of ``wurblpt-cornellbox.cpp:43-229``
(room of quads in [-1,1]^3, area light near the ceiling, tall rotated box +
short object, material variants); `furnace` mirrors
``wurblpt-furnace-test.cpp:33-81``; `rtiow` mirrors the random-spheres scene of
``wurblpt-rtiow.cpp:84-133``.
"""

from __future__ import annotations

import numpy as np

from ..core.transform import Transformation, quat_from_axis_angle
from ..scene import generator as G
from ..scene.builder import (
    EnvironmentMapConstant,
    GGX,
    Glass,
    Lambertian,
    LightDiffuse,
    Mesh,
    MeshInstance,
    Mirror,
    Scene,
    SphereObject,
)


def _quad_to(translate, rotation_axis, rotation_angle, half=1.0):
    mesh = G.generate_quad(half, half)
    tf = Transformation.make(
        translation=translate,
        rotation=quat_from_axis_angle(np.asarray(rotation_axis, np.float32), rotation_angle),
    )
    return mesh, tf


def cornell_box(
    tall_box: str = "white",     # white | mirror
    short_object: str = "box",   # box | sphere | glass_sphere
    light_radiance: float = 12.0,
) -> Scene:
    scene = Scene()
    white = scene.take_material(Lambertian(albedo=(0.725, 0.71, 0.68)), "white")
    red = scene.take_material(Lambertian(albedo=(0.63, 0.065, 0.05)), "red")
    green = scene.take_material(Lambertian(albedo=(0.14, 0.45, 0.091)), "green")
    light = scene.take_material(
        LightDiffuse(radiance=(light_radiance, light_radiance, light_radiance)), "light"
    )

    pi = np.pi
    walls = [
        # floor y=-1 (+y normal)
        ((0, -1, 0), (1, 0, 0), -pi / 2, white),
        # ceiling y=+1 (-y normal)
        ((0, 1, 0), (1, 0, 0), pi / 2, white),
        # back wall z=-1 (+z normal)
        ((0, 0, -1), (0, 1, 0), 0.0, white),
        # left x=-1 (+x normal)
        ((-1, 0, 0), (0, 1, 0), pi / 2, red),
        # right x=+1 (-x normal)
        ((1, 0, 0), (0, 1, 0), -pi / 2, green),
    ]
    for translate, axis, ang, mat in walls:
        mesh, tf = _quad_to(translate, axis, ang)
        scene.take_mesh_instance(MeshInstance(mesh, mat, tf))

    # light panel just below the ceiling, facing down
    lm, ltf = _quad_to((0, 0.998, 0), (1, 0, 0), pi / 2, half=0.25)
    scene.take_mesh_instance(MeshInstance(lm, light, ltf), hot_spot=True)

    # tall box: 0.6 x 1.2 x 0.6 rotated ~17 deg
    tall_mat = white if tall_box == "white" else scene.take_material(Mirror())
    cube = G.generate_cube(0.5)
    tall_tf = Transformation.make(
        translation=(-0.35, -0.4, -0.35),
        rotation=quat_from_axis_angle((0, 1, 0), np.deg2rad(17.0)),
        scale=(0.6, 1.2, 0.6),
    )
    scene.take_mesh_instance(MeshInstance(cube, tall_mat, tall_tf))

    if short_object == "box":
        short_tf = Transformation.make(
            translation=(0.38, -0.7, 0.32),
            rotation=quat_from_axis_angle((0, 1, 0), np.deg2rad(-18.0)),
            scale=(0.6, 0.6, 0.6),
        )
        scene.take_mesh_instance(MeshInstance(cube, white, short_tf))
    elif short_object == "sphere":
        scene.take_sphere(SphereObject((0.38, -0.7, 0.32), 0.3, white))
    elif short_object == "glass_sphere":
        glass = scene.take_material(Glass(ior=1.5))
        scene.take_sphere(SphereObject((0.38, -0.7, 0.32), 0.3, glass))
    return scene


def cornell_box_ref(
    short_object: str = "box",   # box | sphere | glass_sphere
    tall_box: str = "white",     # white | metal
) -> Scene:
    """EXACT replica of the reference Cornell box (wurblpt-cornellbox.cpp:43-229
    default config): same vertices, shading normals, albedos, radiance-4 light.
    Used by the parity tests and bench config 1 so both renderers see
    bit-identical scene definitions (see utils/cornell_data.py)."""
    from . import cornell_data as CD

    scene = Scene()
    mats = {
        name: scene.take_material(Lambertian(albedo=CD.ALBEDO[name]), name)
        for name in ("white", "red", "green")
    }
    mats["tall"] = (mats["white"] if tall_box == "white"
                    else scene.take_material(GGX(albedo=(1.0, 1.0, 1.0), roughness=0.04)))
    mats["short"] = (mats["white"] if short_object == "box"
                     else scene.take_material(Glass(ior=1.5)))
    light = scene.take_material(LightDiffuse(radiance=CD.LIGHT_RADIANCE), "light")

    for pos, nrm, mat in CD.QUADS:
        if mat == "short" and short_object != "box":
            continue
        mesh = Mesh(np.array(pos, np.float32), np.array(nrm, np.float32), CD.UV,
                    indices=CD.IDX)
        scene.take_mesh_instance(MeshInstance(mesh, mats[mat]))
    if short_object in ("sphere", "glass_sphere"):
        m = mats["white"] if short_object == "sphere" else mats["short"]
        scene.take_sphere(SphereObject((0.33, 0.3, 0.37), 0.3, m))
    lpos, lnrm = CD.LIGHT_QUAD
    lmesh = Mesh(np.array(lpos, np.float32), np.array(lnrm, np.float32),
                 CD.UV_LIGHT, indices=CD.IDX)
    scene.take_mesh_instance(MeshInstance(lmesh, light), hot_spot=True)
    return scene


def cornell_ref_camera():
    """Reference viewpoint (wurblpt-cornellbox.cpp:252-256)."""
    from ..core.transform import from_lookat

    return from_lookat((0.0, 1.0, 3.2), (0.0, 1.0, -1.0)), 50.0


def cornell_camera():
    """Reference viewpoint: on +z axis looking at the box center."""
    from ..core.transform import from_lookat

    return from_lookat((0.0, 0.0, 3.2), (0.0, 0.0, 0.0)), 50.0  # (pose, vfov_deg)


def furnace(albedo: float = 0.5, env_radiance: float = 1.0) -> Scene:
    """White furnace: Lambertian sphere in a constant-radiance environment.

    Because the sphere is convex, every scattered ray escapes to the
    environment, so energy conservation demands each sphere pixel equal
    exactly albedo * env_radiance — the classic furnace-test invariant.
    """
    scene = Scene()
    mat = scene.take_material(Lambertian(albedo=(albedo, albedo, albedo)))
    scene.take_sphere(SphereObject((0, 0, 0), 1.0, mat))
    scene.set_environment_map(
        EnvironmentMapConstant(radiance=(env_radiance, env_radiance, env_radiance))
    )
    return scene


def rtiow(seed: int = 7, n: int = 6) -> Scene:
    """Mini 'Ray Tracing in One Weekend' scene: ground + grid of random
    lambertian/metal(GGX)/glass spheres (wurblpt-rtiow.cpp:84-133)."""
    rs = np.random.RandomState(seed)
    scene = Scene()
    ground = scene.take_material(Lambertian(albedo=(0.5, 0.5, 0.5)))
    scene.take_sphere(SphereObject((0, -1000, 0), 1000.0, ground))
    for a in range(-n // 2, n // 2):
        for b in range(-n // 2, n // 2):
            center = (a + 0.9 * rs.rand(), 0.2, b + 0.9 * rs.rand())
            pick = rs.rand()
            if pick < 0.6:
                col = rs.rand(3) * rs.rand(3)
                m = scene.take_material(Lambertian(albedo=tuple(col)))
            elif pick < 0.85:
                col = 0.5 * (1 + rs.rand(3))
                m = scene.take_material(GGX(albedo=tuple(col), roughness=0.1 + 0.3 * rs.rand()))
            else:
                m = scene.take_material(Glass(ior=1.5))
            scene.take_sphere(SphereObject(center, 0.2, m))
    big1 = scene.take_material(Glass(ior=1.5))
    scene.take_sphere(SphereObject((0, 1, 0), 1.0, big1))
    big2 = scene.take_material(Lambertian(albedo=(0.4, 0.2, 0.1)))
    scene.take_sphere(SphereObject((-4, 1, 0), 1.0, big2))
    big3 = scene.take_material(GGX(albedo=(0.7, 0.6, 0.5), roughness=0.05))
    scene.take_sphere(SphereObject((4, 1, 0), 1.0, big3))
    scene.set_environment_map(EnvironmentMapConstant(radiance=(0.7, 0.8, 1.0)))
    return scene


def mis_test(use_ggx: bool = True) -> Scene:
    """Veach-style MIS test (wurblpt-mis-test.cpp:109-144): four glossy plates
    of increasing roughness lit by four spherical lights of decreasing size
    (equal power, so small lights are brightest).  With BSDF-only or NEE-only
    sampling some plate/light combinations are extremely noisy; MIS's power
    heuristic keeps them all low-variance."""
    from ..scene.builder import LightDiffuse

    scene = Scene()
    floor = scene.take_material(Lambertian(albedo=(0.3, 0.3, 0.3)))
    # horizontal floor at y=-1 (+y normal); generate_quad is in the xy plane,
    # so rotate -pi/2 about x (angle 0 would leave a camera-blocking wall).
    fm, ftf = _quad_to((0.0, -1.0, 0.0), (1.0, 0.0, 0.0), -np.pi / 2, half=8.0)
    scene.take_mesh_instance(MeshInstance(fm, floor, ftf))

    roughnesses = (0.005, 0.02, 0.08, 0.25)
    for i, r in enumerate(roughnesses):
        mat = (scene.take_material(GGX(albedo=(0.85, 0.85, 0.85), roughness=r))
               if use_ggx else
               scene.take_material(Lambertian(albedo=(0.85, 0.85, 0.85))))
        mesh = G.generate_quad(2.0, 0.22)
        tilt = np.deg2rad(55.0 - 9.0 * i)
        tf = Transformation.make(
            translation=(0.0, -0.7 + 0.5 * i, -1.2 - 0.45 * i),
            rotation=quat_from_axis_angle(np.array([1.0, 0.0, 0.0], np.float32),
                                          -tilt),
        )
        scene.take_mesh_instance(MeshInstance(mesh, mat, tf))

    radii = (0.45, 0.16, 0.06, 0.02)
    xs = (-1.65, -0.55, 0.55, 1.65)
    for x, rad in zip(xs, radii):
        radiance = 1.2 * (0.25 / rad) ** 2   # equal power across sizes
        lm = scene.take_material(LightDiffuse(radiance=(radiance,) * 3))
        scene.take_sphere(SphereObject((x, 1.3, -2.5), rad, lm), hot_spot=True)
    return scene


def mis_camera():
    from ..core.transform import from_lookat

    return from_lookat((0.0, 0.9, 3.6), (0.0, -0.1, -1.6)), 42.0


def procedural_sky(height: int = 64, sun_dir=(0.4, 0.6, -0.5),
                   sun_radiance: float = 200.0) -> np.ndarray:
    """Small procedural HDR sky (gradient + sun disk) as an equirect image,
    for envmap examples/tests without external HDR assets."""
    w = 2 * height
    y, x = np.mgrid[0:height, 0:w]
    theta = (0.5 - (y + 0.5) / height) * np.pi       # latitude
    phi = ((x + 0.5) / w * 2.0 - 1.0) * np.pi
    d = np.stack([np.cos(theta) * np.sin(phi), np.sin(theta),
                  -np.cos(theta) * np.cos(phi)], -1)
    sky_t = np.clip(d[..., 1] * 0.5 + 0.5, 0, 1)[..., None]
    img = (1 - sky_t) * np.array([0.9, 0.7, 0.5]) + sky_t * np.array([0.25, 0.45, 0.9])
    s = np.asarray(sun_dir, np.float64)
    s /= np.linalg.norm(s)
    cos_sun = np.clip((d * s).sum(-1), -1, 1)
    img = img + (cos_sun > np.cos(np.deg2rad(2.5)))[..., None] * sun_radiance
    return img.astype(np.float32)


def envmap_spheres(cube: bool = False, importance_resolution: int = 64) -> Scene:
    """Glass / mirror / GGX spheres over a ground plane under an HDR sky
    (wurblpt-envmap.cpp:60-116), equirect or cube-map parameterization."""
    from ..scene.builder import EnvironmentMapCube, EnvironmentMapEquiRect

    scene = Scene()
    ground = scene.take_material(Lambertian(albedo=(0.4, 0.4, 0.4)))
    # horizontal ground at y=-0.5 (+y normal); generate_quad is in the xy
    # plane, so rotate -pi/2 about x (angle 0 would be a camera-facing wall).
    gm, gtf = _quad_to((0.0, -0.5, 0.0), (1.0, 0.0, 0.0), -np.pi / 2, half=20.0)
    scene.take_mesh_instance(MeshInstance(gm, ground, gtf))
    scene.take_sphere(SphereObject((-1.2, 0.0, 0.0), 0.5,
                                   scene.take_material(Glass(ior=1.5))))
    scene.take_sphere(SphereObject((0.0, 0.0, 0.0), 0.5,
                                   scene.take_material(Mirror())))
    scene.take_sphere(SphereObject((1.2, 0.0, 0.0), 0.5,
                                   scene.take_material(GGX(albedo=(0.8, 0.6, 0.3),
                                                           roughness=0.15))))
    sky = procedural_sky()
    if cube:
        faces = _equirect_to_cube_faces(sky, 32)
        scene.set_environment_map(EnvironmentMapCube(
            faces=faces, importance_resolution=importance_resolution))
    else:
        scene.set_environment_map(EnvironmentMapEquiRect(
            image=sky, importance_resolution=importance_resolution))
    return scene


def _equirect_to_cube_faces(img: np.ndarray, face_res: int):
    """Resample an equirect image into 6 cube faces (+x,-x,+y,-y,+z,-z)."""
    h, w = img.shape[:2]
    uv = (np.arange(face_res) + 0.5) / face_res * 2.0 - 1.0
    b, a = np.meshgrid(uv, uv)  # a = row (v), b = col (u)
    ones = np.ones_like(a)
    # standard cube-face direction conventions
    dirs = {
        0: np.stack([ones, -a, -b], -1),    # +x
        1: np.stack([-ones, -a, b], -1),    # -x
        2: np.stack([b, ones, a], -1),      # +y
        3: np.stack([b, -ones, -a], -1),    # -y
        4: np.stack([b, -a, ones], -1),     # +z
        5: np.stack([-b, -a, -ones], -1),   # -z
    }
    faces = []
    for i in range(6):
        d = dirs[i]
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        theta = np.arcsin(np.clip(d[..., 1], -1, 1))
        phi = np.arctan2(d[..., 0], -d[..., 2])
        x = np.clip(((phi / np.pi + 1.0) * 0.5 * w).astype(int), 0, w - 1)
        y = np.clip(((0.5 - theta / np.pi) * h).astype(int), 0, h - 1)
        faces.append(img[y, x])
    return faces


def terrain_city(seed: int = 3, terrain_res: int = 192, n_buildings: int = 220,
                 sphere_slices: int = 24) -> Scene:
    """Procedural >100k-triangle scene: fBm terrain + box "buildings" + a few
    tessellated spheres under a sun/sky envmap. Stands in for the Sponza-class
    OBJ scenes (wurblpt-sponza.cpp:73-143) to exercise import-scale geometry,
    the SAH BVH build, and BVH-path traversal throughput at benchmark scale.
    """
    from ..scene.builder import EnvironmentMapEquiRect

    rs = np.random.RandomState(seed)
    scene = Scene()
    ground = scene.take_material(Lambertian(albedo=(0.35, 0.4, 0.3)))

    # fBm heightfield terrain: (res-1)^2 * 2 triangles (192 -> 72962 tris)
    phases = [(rs.uniform(0, 2 * np.pi), rs.uniform(0, 2 * np.pi))
              for _ in range(4)]

    def fbm(x, z):
        out = np.zeros_like(np.asarray(x, np.float32))
        for octave, (px, pz) in enumerate(phases):
            f = 0.15 * (2.0 ** octave)
            a = 1.2 * (0.5 ** octave)
            out = out + a * np.sin(f * x + px) * np.cos(f * z + pz)
        return out

    res = terrain_res
    xs = np.linspace(-20.0, 20.0, res, dtype=np.float32)
    zs = np.linspace(-20.0, 20.0, res, dtype=np.float32)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    h = fbm(xx, zz)
    pos = np.stack([xx, h, zz], -1).reshape(-1, 3)
    idx = []
    for i in range(res - 1):
        a0 = i * res + np.arange(res - 1)
        idx.append(np.stack([a0, a0 + 1, a0 + res], -1))
        idx.append(np.stack([a0 + 1, a0 + res + 1, a0 + res], -1))
    idx = np.concatenate(idx, 0).astype(np.int32)
    uv = np.stack([(xx + 20.0) / 40.0, (zz + 20.0) / 40.0], -1).reshape(-1, 2)
    terrain = Mesh(pos, None, uv.astype(np.float32), indices=idx)
    scene.take_mesh_instance(MeshInstance(terrain, ground))

    # box buildings (12 tris each)
    cube = G.generate_cube(0.5)
    for _ in range(n_buildings):
        bx, bz = rs.uniform(-18, 18, 2)
        bh = rs.uniform(0.5, 3.0)
        mat = scene.take_material(Lambertian(albedo=tuple(0.3 + 0.5 * rs.rand(3))))
        tf = Transformation.make(
            translation=(bx, float(fbm(bx, bz)) + bh / 2, bz),
            rotation=quat_from_axis_angle((0, 1, 0), rs.uniform(0, np.pi)),
            scale=(rs.uniform(0.4, 1.5), bh, rs.uniform(0.4, 1.5)),
        )
        scene.take_mesh_instance(MeshInstance(cube, mat, tf))

    # tessellated spheres: ~2*slices^2 tris each
    for i in range(24):
        sx, sz = rs.uniform(-15, 15, 2)
        mat = (scene.take_material(GGX(albedo=(0.8, 0.7, 0.6),
                                       roughness=0.1 + 0.2 * rs.rand()))
               if i % 3 else scene.take_material(Mirror()))
        mesh = G.generate_sphere(1.0, slices=sphere_slices, stacks=sphere_slices)
        tf = Transformation.make(translation=(sx, 2.0 + rs.rand(), sz),
                                 scale=(0.8, 0.8, 0.8))
        scene.take_mesh_instance(MeshInstance(mesh, mat, tf))

    scene.set_environment_map(EnvironmentMapEquiRect(image=procedural_sky(),
                                                     importance_resolution=32))
    return scene


def city_night(seed: int = 7, terrain_res: int = 320, n_buildings: int = 320,
               n_windows: int = 96, sphere_slices: int = 32,
               obj_roundtrip: bool = True, workdir: str = None) -> Scene:
    """Sponza-class composition benchmark scene (BASELINE config 5 stand-in,
    wurblpt-sponza.cpp:73-143): >200k triangles, MULTI-MATERIAL (ModPhong +
    Lambertian + GGX + mirror + one measured-RGL sphere), and >=64 emissive
    "window" area lights of strongly varying power — the regime where uniform
    light picking collapses and the power-proportional alias table
    (scene/flatten.build_alias_table) earns its keep.

    With `obj_roundtrip` the whole surface scene is EXPORTED to OBJ/MTL and
    re-imported (io/obj), exercising the full import pipeline (material
    heuristics, emissive hot-spot registration, mesh merge) at import scale —
    the reference's sponza workflow. RGL material and envmap are attached
    after the round trip (MTL cannot represent them).
    """
    import tempfile

    from ..scene.builder import EnvironmentMapEquiRect, ModPhong, RGLMaterial

    rs = np.random.RandomState(seed)
    scene = Scene()
    ground = scene.take_material(Lambertian(albedo=(0.25, 0.28, 0.24)))

    phases = [(rs.uniform(0, 2 * np.pi), rs.uniform(0, 2 * np.pi))
              for _ in range(4)]

    def fbm(x, z):
        out = np.zeros_like(np.asarray(x, np.float32))
        for octave, (px, pz) in enumerate(phases):
            f = 0.12 * (2.0 ** octave)
            a = 0.9 * (0.5 ** octave)
            out = out + a * np.sin(f * x + px) * np.cos(f * z + pz)
        return out

    res = terrain_res
    xs = np.linspace(-24.0, 24.0, res, dtype=np.float32)
    zs = np.linspace(-24.0, 24.0, res, dtype=np.float32)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    h = fbm(xx, zz)
    pos = np.stack([xx, h, zz], -1).reshape(-1, 3)
    idx = []
    for i in range(res - 1):
        a0 = i * res + np.arange(res - 1)
        idx.append(np.stack([a0, a0 + 1, a0 + res], -1))
        idx.append(np.stack([a0 + 1, a0 + res + 1, a0 + res], -1))
    idx = np.concatenate(idx, 0).astype(np.int32)
    uv = np.stack([(xx + 24.0) / 48.0, (zz + 24.0) / 48.0], -1).reshape(-1, 2)
    scene.take_mesh_instance(MeshInstance(
        Mesh(pos, None, uv.astype(np.float32), indices=idx), ground))

    # ModPhong buildings (the reference's OBJ work-horse material) with
    # emissive windows on a subset.
    cube = G.generate_cube(0.5)
    window_budget = n_windows
    building_info = []
    for bi in range(n_buildings):
        bx, bz = rs.uniform(-22, 22, 2)
        bh = rs.uniform(0.8, 4.0)
        sx, sz = rs.uniform(0.5, 1.6), rs.uniform(0.5, 1.6)
        col = tuple(0.25 + 0.5 * rs.rand(3))
        mat = scene.take_material(ModPhong(
            diffuse=col, specular=tuple(0.1 + 0.2 * rs.rand(3)),
            shininess=float(rs.uniform(20, 160))))
        ty = float(fbm(bx, bz)) + bh / 2
        tf = Transformation.make(translation=(bx, ty, bz), scale=(sx, bh, sz))
        scene.take_mesh_instance(MeshInstance(cube, mat, tf))
        building_info.append((bx, ty, bz, sx, bh, sz))

    # Emissive windows: small quads floating just off building faces; powers
    # span ~2 decades so uniform light picking is hopeless.
    for wi in range(window_budget):
        bx, ty, bz, sx, bh, sz = building_info[wi % len(building_info)]
        warm = np.array([1.0, rs.uniform(0.5, 0.9), rs.uniform(0.2, 0.6)])
        radiance = tuple(warm * rs.uniform(2.0, 120.0))
        lm = scene.take_material(LightDiffuse(radiance=radiance))
        side = 1.0 if wi % 2 == 0 else -1.0
        wtf = Transformation.make(
            translation=(bx + side * (sx * 0.5 + 0.01),
                         ty + rs.uniform(-0.3, 0.3) * bh, bz),
            rotation=quat_from_axis_angle((0, 1, 0), side * np.pi / 2),
            scale=(0.18, 0.12, 1.0))
        scene.take_mesh_instance(
            MeshInstance(G.generate_quad(1.0, 1.0), lm, wtf), hot_spot=True)

    # GGX / mirror spheres
    for i in range(20):
        sx_, sz_ = rs.uniform(-18, 18, 2)
        mat = (scene.take_material(GGX(albedo=(0.8, 0.7, 0.6),
                                       roughness=0.08 + 0.2 * rs.rand()))
               if i % 3 else scene.take_material(Mirror()))
        mesh = G.generate_sphere(1.0, slices=sphere_slices, stacks=sphere_slices)
        tf = Transformation.make(
            translation=(sx_, float(fbm(sx_, sz_)) + 1.4, sz_),
            scale=(0.8, 0.8, 0.8))
        scene.take_mesh_instance(MeshInstance(mesh, mat, tf))

    if obj_roundtrip:
        from ..io.obj import export_scene_to_obj, import_into_scene

        workdir = workdir or tempfile.mkdtemp(prefix="wurblpt_city_")
        path = f"{workdir}/city_night.obj"
        export_scene_to_obj(scene, path)
        scene = Scene()
        import_into_scene(scene, path)

    # Post-roundtrip extras: a measured-RGL sphere + night sky (not
    # representable in MTL).
    from ..materials import rgl as rgl_mod

    rs2 = np.random.RandomState(seed + 1)

    def _smooth_positive(shape, s, lo=0.05, hi=1.0):
        rs3 = np.random.RandomState(s)
        a = rs3.uniform(lo, hi, shape).astype(np.float32)
        for ax in range(a.ndim):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return a.astype(np.float32)

    T = 4
    fields = dict(
        phi_i=np.zeros((1,), np.float32),
        theta_i=np.linspace(0.0, np.pi / 2, T).astype(np.float32),
        ndf=_smooth_positive((16, 16), seed + 11),
        sigma=_smooth_positive((16, 16), seed + 12, 0.2, 0.4),
        vndf=_smooth_positive((1, T, 16, 16), seed + 13),
        luminance=_smooth_positive((1, T, 8, 8), seed + 14),
        rgb=_smooth_positive((1, T, 3, 8, 8), seed + 15),
    )
    scene.take_rgl_table("city_rgl", rgl_mod.load_rgl_material(fields))
    rglm = scene.take_material(RGLMaterial(table_name="city_rgl"))
    scene.take_mesh_instance(MeshInstance(
        G.generate_sphere(1.0, slices=sphere_slices, stacks=sphere_slices),
        rglm,
        Transformation.make(translation=(0.0, float(fbm(0.0, 4.0)) + 1.6, 4.0),
                            scale=(1.2, 1.2, 1.2))))

    night = procedural_sky(sun_radiance=2.0) * 0.08  # dim dusk sky
    scene.set_environment_map(EnvironmentMapEquiRect(
        image=night.astype(np.float32), importance_resolution=32))
    return scene


def tof_box(room_half: float = 1.2) -> Scene:
    """AMCW ToF scenario (wurblpt-tof-hcibox.cpp:38-103): a closed box room
    observed by a camera with a rigidly attached NIR ToF light at the origin."""
    from ..scene.builder import LightTof

    scene = Scene()
    white = scene.take_material(Lambertian(albedo=(0.7, 0.7, 0.7)))
    h = room_half
    for tr, ax, ang in (
        ((0, 0, -h), (1, 0, 0), 0.0),               # back wall
        ((-h, 0, 0), (0, 1, 0), np.pi / 2),          # left
        ((h, 0, 0), (0, 1, 0), -np.pi / 2),          # right
        ((0, -h, 0), (1, 0, 0), -np.pi / 2),         # floor
        ((0, h, 0), (1, 0, 0), np.pi / 2),           # ceiling
    ):
        mesh, tf = _quad_to(tr, ax, ang, half=h)
        scene.take_mesh_instance(MeshInstance(mesh, white, tf))
    # small diffuse box inside for depth structure
    box = G.generate_cube(0.25)
    btf = Transformation.make(translation=(0.3, -h + 0.25, -0.4))
    scene.take_mesh_instance(MeshInstance(box, white, btf))
    # ToF illumination unit at the camera position, facing INTO the room
    # (-z): generate_disk's +z normal must be flipped or the light shines
    # into the wall behind it and the whole capture is black (round-4 fix —
    # the bench only measured throughput, so the dark frame went unnoticed
    # until the reference twin rendered black too).
    tof = scene.take_material(LightTof(radiance_w=8.0, half_angle=np.deg2rad(40)))
    lm = G.generate_disk(0.02)
    ltf = Transformation.make(translation=(0.0, 0.0, h - 0.01),
                              rotation=quat_from_axis_angle((0, 1, 0), np.pi))
    scene.take_mesh_instance(MeshInstance(lm, tof, ltf), hot_spot=True)
    return scene
