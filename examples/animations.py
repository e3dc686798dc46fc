"""Keyframe animation + motion blur video frames (reference apps:
wurblpt-animations.cpp, wurblpt-rolling-marbles.cpp): a sphere follows
keyframed poses; each frame is rendered over [t, t + exposure] so fast motion
blurs."""

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("animations", width=192, height=144, ssqrt=4, depth=6)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--fps", type=float, default=25.0)
    p.add_argument("--shutter", type=float, default=0.5, help="shutter fraction")
    args = p.parse_args()
    setup_platform(args)

    import numpy as np

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import Transformation, from_lookat
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene.builder import AnimationKeyframes
    from wurblpt_tpu.utils.scenes import _quad_to

    duration = args.frames / args.fps
    scene = B.Scene()
    floor = scene.take_material(B.Lambertian(albedo=(0.45, 0.45, 0.45)))
    import numpy as np
    fm, ftf = _quad_to((0, -0.5, 0), (1, 0, 0), -np.pi / 2, half=8.0)
    scene.take_mesh_instance(B.MeshInstance(fm, floor, ftf))
    light = scene.take_material(B.LightDiffuse(radiance=(10.0,) * 3))
    scene.take_sphere(B.SphereObject((0, 2.5, 0), 0.5, light), hot_spot=True)

    anim = AnimationKeyframes(
        times=[0.0, duration],
        transformations=[
            Transformation.make(translation=(-1.5, 0.0, 0.0)),
            Transformation.make(translation=(1.5, 0.0, 0.0)),
        ],
    )
    aid = scene.take_animation(anim)
    red = scene.take_material(B.Lambertian(albedo=(0.8, 0.2, 0.15)))
    scene.take_sphere(B.SphereObject((0, 0, 0), 0.5, red, animation=aid))

    cam = make_camera(transformation=from_lookat((0, 1.0, 4.0), (0, 0, 0)),
                      vfov_deg=40.0, width=args.width, height=args.height)

    for f in range(args.frames):
        t0 = f / args.fps
        t1 = t0 + args.shutter / args.fps
        built = scene.build(t0=t0, t1=t1)
        img = render(built, cam, CameraConfig(), SensorRGB(), args, t0=t0, t1=t1)
        save_png(args.output.replace(".png", f"-{f:03d}.png"), img)


if __name__ == "__main__":
    main()
