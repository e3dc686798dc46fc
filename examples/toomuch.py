"""Geometry stress scene (reference app: wurblpt-toomuch): thousands of
instanced generator meshes — tori, cones, cylinders, platonic solids — with
randomized materials under a sky, pushed through the BVH path.
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("toomuch", width=480, height=270, ssqrt=3, depth=5)
    p.add_argument("--objects", type=int, default=600)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import Transformation, from_lookat, quat_from_axis_angle
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene import generator as G
    from wurblpt_tpu.utils.scenes import _quad_to, procedural_sky

    rng = np.random.default_rng(11)
    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(albedo=(0.45, 0.42, 0.4)))
    fm, ftf = _quad_to((0, -0.5, 0), (1, 0, 0), -np.pi / 2, half=30.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))

    protos = [
        G.generate_torus(1.0, 0.35, 24, 16),
        G.generate_cone(0.8, 1.6, 24),
        G.generate_cylinder(0.5, 0.8, 24),
        G.generate_icosahedron(),
        G.generate_octahedron(),
        G.generate_sphere(1.0, 16, 12),
        G.generate_cube(0.7),
    ]
    n_tris = 0
    for i in range(args.objects):
        mesh = protos[i % len(protos)]
        n_tris += len(mesh.indices)
        kind = rng.integers(0, 10)
        if kind < 6:
            mat = B.Lambertian(albedo=tuple(0.2 + 0.7 * rng.random(3)))
        elif kind < 8:
            mat = B.GGX(albedo=tuple(0.5 + 0.5 * rng.random(3)),
                        roughness=float(rng.uniform(0.05, 0.4)))
        elif kind < 9:
            mat = B.Mirror()
        else:
            mat = B.Glass(ior=1.5)
        x, z = rng.uniform(-25, 25, 2)
        s = float(rng.uniform(0.15, 0.6))
        tf = Transformation.make(
            translation=(x, -0.5 + s * 1.2, z),
            rotation=quat_from_axis_angle(
                rng.normal(size=3) / np.linalg.norm(rng.normal(size=3) + 1e-6),
                rng.uniform(0, np.pi)),
            scale=(s, s, s))
        scene.take_mesh_instance(B.MeshInstance(mesh, mat, tf))
    print(f"{args.objects} objects, ~{n_tris} triangles")

    scene.set_environment_map(B.EnvironmentMapEquiRect(
        image=procedural_sky(), importance_resolution=32))
    built = scene.build(use_bvh=True)
    cam = make_camera(transformation=from_lookat((0, 4.0, 16.0), (0, 0, 0)),
                      vfov_deg=45.0, width=args.width, height=args.height)
    img = render(built, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
