"""Ray Tracing In One Weekend spheres (reference app: wurblpt-rtiow.cpp).

Depth of field + optional 360/180 surround and top/bottom stereo output.
"""

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("rtiow", width=320, height=200, ssqrt=4, depth=8)
    p.add_argument("--surround", default="off", choices=("off", "180", "360"))
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--aperture", type=float, default=0.08)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import SurroundMode
    from wurblpt_tpu.utils import scenes

    scene = scenes.rtiow().build()
    pose = from_lookat((13.0, 2.0, 3.0), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=25.0,
                      width=args.width, height=args.height,
                      focus_distance=10.0, aperture_diameter=args.aperture,
                      eye_distance=0.07 if args.stereo else 0.0)
    cfg = CameraConfig(
        surround={"off": SurroundMode.OFF, "180": SurroundMode.S180,
                  "360": SurroundMode.S360}[args.surround],
        stereo=args.stereo,
        dof=args.aperture > 0.0,
    )
    img = render(scene, cam, cfg, SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
