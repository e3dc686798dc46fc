"""Cornell box (reference app: wurblpt-cornellbox.cpp).

Material variants for the tall box / short object, URQ tonemap + sRGB output.
"""

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("cornellbox", width=256, height=256, ssqrt=6, depth=16)
    p.add_argument("--tall-box", default="white", choices=("white", "mirror"))
    p.add_argument("--short-object", default="box",
                   choices=("box", "sphere", "glass_sphere"))
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.utils import scenes

    scene = scenes.cornell_box(tall_box=args.tall_box,
                               short_object=args.short_object).build()
    pose, vfov = scenes.cornell_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov,
                      width=args.width, height=args.height)
    img = render(scene, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
