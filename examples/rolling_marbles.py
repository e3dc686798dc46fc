"""Rolling marbles video (reference app: wurblpt-rolling-marbles): textured
spheres rolling across a floor, rendered as a short frame sequence with
per-frame motion blur (keyframed translation + rotation; t0 != t1 engages
the motion-blur path of render_frame).
"""

import numpy as np

from _common import default_parser, save_png, setup_platform


def main():
    p = default_parser("rolling_marbles", width=320, height=180, ssqrt=3,
                       depth=5)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--fps", type=float, default=24.0)
    args = p.parse_args()
    setup_platform(args)

    import jax

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.core.transform import (Transformation, from_lookat,
                                            quat_from_axis_angle)
    from wurblpt_tpu.render.integrator import render_frame
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene.builder import AnimationKeyframes
    from wurblpt_tpu.scene.ir import TextureType
    from wurblpt_tpu.utils.scenes import _quad_to

    duration = args.frames / args.fps
    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(
        albedo=B.CheckerTexture(color1=(0.5, 0.45, 0.4),
                                color2=(0.25, 0.25, 0.3), squares=(20, 20))))
    fm, ftf = _quad_to((0, -0.5, 0), (1, 0, 0), -np.pi / 2, half=8.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))

    light = scene.take_material(B.LightDiffuse(radiance=(18.0,) * 3))
    scene.take_sphere(B.SphereObject((0, 4.0, 2.0), 0.6, light), hot_spot=True)

    rng = np.random.default_rng(5)
    for i in range(5):
        r = 0.3
        z = -1.2 + 0.6 * i
        x0, x1 = -3.0, 3.0
        speed_sign = 1.0 if i % 2 == 0 else -1.0
        # rolling = translation + matched rotation about z
        roll_angle = speed_sign * (x1 - x0) / r
        anim = AnimationKeyframes(
            times=[0.0, duration],
            transformations=[
                Transformation.make(
                    translation=(x0 * speed_sign, -0.5 + r, z)),
                Transformation.make(
                    translation=(x1 * speed_sign, -0.5 + r, z),
                    rotation=quat_from_axis_angle((0, 0, 1), -roll_angle)),
            ])
        aid = scene.take_animation(anim)
        tex = B.NoiseTexture(kind=TextureType.PERLIN_NOISE, frequency=8.0,
                             octaves=5, turbulence=True, seed=i,
                             val_scale=tuple(0.6 * rng.random(3) + 0.2) + (1.0,))
        scene.take_sphere(B.SphereObject((0.0, 0.0, 0.0), r,
                                         B.Lambertian(albedo=tex),
                                         animation=aid))

    built = scene.build(t0=0.0, t1=duration)
    static = SceneStatic.from_scene(built)
    cam = make_camera(transformation=from_lookat((0, 1.8, 5.5), (0, 0, 0)),
                      vfov_deg=38.0, width=args.width, height=args.height)
    params = RenderParams(max_path_components=args.max_depth)

    frame_dt = 1.0 / args.fps
    shutter = 0.5 * frame_dt  # 180-degree shutter
    for f in range(args.frames):
        t0 = f * frame_dt
        img = render_frame(built, static, cam, CameraConfig(), SensorRGB(),
                           args.width, args.height, args.samples_sqrt,
                           t0, t0 + shutter, params)
        out = args.output.replace(".png", f"-{f:03d}.png")
        save_png(out, np.asarray(img))


if __name__ == "__main__":
    main()
