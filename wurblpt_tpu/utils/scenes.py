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
