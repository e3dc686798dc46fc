"""Procedural noise texture gallery (reference app: wurblpt-noise-textures.cpp).

One sphere per noise type — value, gradient, Worley, signed Perlin, Perlin
turbulence (texture_noise.hpp:37-252) — on a checkered floor under a sky.
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("noise_textures", width=480, height=200, ssqrt=4, depth=5)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene.ir import TextureType
    from wurblpt_tpu.utils.scenes import _quad_to

    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(
        albedo=B.CheckerTexture(color1=(0.25,) * 3, color2=(0.6,) * 3,
                                squares=(24, 24))))
    fm, ftf = _quad_to((0.0, -0.5, 0.0), (1.0, 0.0, 0.0), -np.pi / 2, half=12.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))

    kinds = [
        ("value", B.NoiseTexture(kind=TextureType.VALUE_NOISE, octaves=4,
                                 frequency=6.0)),
        ("gradient", B.NoiseTexture(kind=TextureType.GRADIENT_NOISE, octaves=4,
                                    frequency=6.0)),
        ("worley", B.NoiseTexture(kind=TextureType.WORLEY_NOISE, frequency=8.0)),
        ("perlin", B.NoiseTexture(kind=TextureType.PERLIN_NOISE, frequency=8.0,
                                  turbulence=False,
                                  # remap signed [-0.7, 0.7] -> [0, 1]
                                  val_scale=(0.7, 0.7, 0.7, 1.0),
                                  val_offset=(0.5, 0.5, 0.5, 0.0))),
        ("turbulence", B.NoiseTexture(kind=TextureType.PERLIN_NOISE, octaves=7,
                                      frequency=6.0, gain=0.5, turbulence=True)),
    ]
    for i, (name, tex) in enumerate(kinds):
        x = -3.0 + 1.5 * i
        scene.take_sphere(B.SphereObject((x, 0.1, 0.0), 0.6,
                                         B.Lambertian(albedo=tex)))

    light = scene.take_material(B.LightDiffuse(radiance=(26.0, 24.0, 22.0)))
    scene.take_sphere(B.SphereObject((0.0, 5.0, 3.0), 0.8, light),
                      hot_spot=True)
    scene.set_environment_map(B.EnvironmentMapConstant(radiance=(0.25, 0.28, 0.35)))
    built = scene.build()
    cam = make_camera(transformation=from_lookat((0.0, 1.3, 5.2), (0.0, 0.0, 0.0)),
                      vfov_deg=32.0, width=args.width, height=args.height)
    img = render(built, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
