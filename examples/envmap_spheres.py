"""Environment-map lighting (reference app: wurblpt-envmap.cpp).

Glass/mirror/GGX spheres under a procedural HDR sky; equirect or cube-map
parameterization; importance sampling on/off.
"""

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("envmap_spheres", width=320, height=180, ssqrt=4, depth=6)
    p.add_argument("--cube", action="store_true", help="cube-map parameterization")
    p.add_argument("--no-importance", action="store_true")
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.utils import scenes

    scene = scenes.envmap_spheres(
        cube=args.cube,
        importance_resolution=0 if args.no_importance else 64,
    ).build()
    pose = from_lookat((0.0, 0.6, 3.5), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=40.0,
                      width=args.width, height=args.height)
    img = render(scene, cam, CameraConfig(), SensorRGB(), args)
    save_png(args.output, img)


if __name__ == "__main__":
    main()
