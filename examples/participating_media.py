"""Homogeneous participating medium (reference app:
wurblpt-participating-media.cpp): a foggy sphere volume between the camera and
an area light, isotropic phase function."""

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("participating_media", width=256, height=192, ssqrt=4,
                       depth=12)
    p.add_argument("--density", type=float, default=1.5)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene import generator as G
    from wurblpt_tpu.utils.scenes import _quad_to

    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(albedo=(0.4, 0.4, 0.45)))
    import numpy as np
    fm, ftf = _quad_to((0, -1.0, 0), (1, 0, 0), -np.pi / 2, half=10.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))

    light = scene.take_material(B.LightDiffuse(radiance=(14.0, 12.0, 10.0)))
    scene.take_sphere(B.SphereObject((0.0, 1.6, -2.0), 0.35, light),
                      hot_spot=True)

    red = scene.take_material(B.Lambertian(albedo=(0.7, 0.2, 0.2)))
    scene.take_sphere(B.SphereObject((-0.8, -0.6, -0.4), 0.4, red))

    # Fog volume: sphere boundary, isotropic phase function
    phase = B.PhaseIso(albedo=(0.9, 0.9, 0.9))
    scene.take_medium(B.MediumObject(
        boundary=B.SphereObject((0.4, 0.0, -0.8), 1.0, 0),
        density=args.density, phase=phase))

    built = scene.build()
    cam = make_camera(transformation=from_lookat((0, 0.4, 3.2), (0, 0, -0.8)),
                      vfov_deg=45.0, width=args.width, height=args.height)
    img = render(built, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
