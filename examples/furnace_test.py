"""White furnace energy-conservation test (reference app:
wurblpt-furnace-test.cpp:33-81): every sphere pixel must equal albedo *
environment radiance exactly."""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("furnace_test", width=128, height=128, ssqrt=4, depth=16)
    p.add_argument("--albedo", type=float, default=0.5)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, RenderParams, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.utils import scenes

    scene = scenes.furnace(albedo=args.albedo).build()
    cam = make_camera(transformation=from_lookat((0, 0, 3), (0, 0, 0)),
                      vfov_deg=45.0, width=args.width, height=args.height)
    # randomize_ray_over_pixel off keeps the sphere edge sharp (furnace-test.cpp:76)
    params = RenderParams(max_path_components=args.max_depth,
                          randomize_ray_over_pixel=False)
    img = render(scene, cam, CameraConfig(), SensorRGB(), args, params=params)
    a = np.asarray(img)
    center = a[a.shape[0] // 2, a.shape[1] // 2]
    print(f"center pixel = {center} (expected {args.albedo})")
    err = np.abs(center[:3] - args.albedo).max()
    print("energy conservation:", "PASS" if err < 1e-3 else f"FAIL (err={err})")
    save_png(args.output, img, tonemap=False)


if __name__ == "__main__":
    main()
