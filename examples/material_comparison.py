"""Material comparison grid (reference apps: wurblpt-material-comparison /
wurblpt-material-playground): one sphere per material model — Lambertian, GGX
rough/smooth, anisotropic GGX, glass (with dispersion), mirror, ModPhong, and
a measured RGL table — under an area light + sky.
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def _synthetic_rgl(seed=0):
    from wurblpt_tpu.materials import rgl

    def smooth(shape, s, lo=0.05, hi=1.0):
        rs = np.random.RandomState(s)
        a = rs.uniform(lo, hi, shape).astype(np.float32)
        for ax in range(a.ndim):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return a.astype(np.float32)

    T = 4
    return rgl.load_rgl_material(dict(
        phi_i=np.zeros((1,), np.float32),
        theta_i=np.linspace(0.0, np.pi / 2, T).astype(np.float32),
        ndf=smooth((16, 16), seed + 1),
        sigma=smooth((16, 16), seed + 2, 0.2, 0.4),
        vndf=smooth((1, T, 16, 16), seed + 3),
        luminance=smooth((1, T, 8, 8), seed + 4),
        rgb=smooth((1, T, 3, 8, 8), seed + 5),
    ))


def main():
    p = default_parser("material_comparison", width=560, height=180, ssqrt=4,
                       depth=8)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.utils.scenes import _quad_to

    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(
        albedo=B.CheckerTexture(color1=(0.3,) * 3, color2=(0.55,) * 3,
                                squares=(32, 32))))
    fm, ftf = _quad_to((0.0, -0.5, 0.0), (1.0, 0.0, 0.0), -np.pi / 2, half=14.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))

    scene.take_rgl_table("measured", _synthetic_rgl())
    mats = [
        B.Lambertian(albedo=(0.7, 0.3, 0.25)),
        B.GGX(albedo=(0.9, 0.7, 0.3), roughness=0.25),
        B.GGX(albedo=(0.9, 0.9, 0.95), roughness=0.03),
        B.GGX(albedo=(0.8, 0.8, 0.9), roughness=(0.02, 0.3)),  # anisotropic
        B.Glass(ior=(1.50, 1.52, 1.54, 1.52)),                 # dispersion
        B.Mirror(),
        B.ModPhong(diffuse=(0.2, 0.35, 0.6), specular=(0.4,) * 3,
                   shininess=90.0),
        B.RGLMaterial(table_name="measured"),
    ]
    for i, m in enumerate(mats):
        x = -5.25 + 1.5 * i
        scene.take_sphere(B.SphereObject((x, 0.1, 0.0), 0.6, m))

    light = scene.take_material(B.LightDiffuse(radiance=(30.0,) * 3))
    scene.take_sphere(B.SphereObject((0.0, 6.0, 4.0), 1.0, light),
                      hot_spot=True)
    scene.set_environment_map(B.EnvironmentMapConstant(radiance=(0.35, 0.4, 0.5)))

    built = scene.build()
    cam = make_camera(transformation=from_lookat((0.0, 1.6, 9.0), (0.0, 0.0, 0.0)),
                      vfov_deg=16.0, width=args.width, height=args.height)
    img = render(built, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
