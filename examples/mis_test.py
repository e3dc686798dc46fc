"""Veach MIS test (reference app: wurblpt-mis-test.cpp:109-144).

Renders the plate/light grid twice — NEE+MIS on vs BSDF-sampling only — and
reports the per-image variance proxy so the power heuristic's win is visible.
"""

import numpy as np

from _common import default_parser, render, save_png, setup_platform


def main():
    p = default_parser("mis_test", width=320, height=240, ssqrt=4, depth=4)
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import CameraConfig, RenderParams, SensorRGB, make_camera
    from wurblpt_tpu.utils import scenes

    scene = scenes.mis_test().build()
    pose, vfov = scenes.mis_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov,
                      width=args.width, height=args.height)
    params = RenderParams(max_path_components=args.max_depth)
    img_mis = render(scene, cam, CameraConfig(), SensorRGB(), args, params=params)
    save_png(args.output, img_mis)

    # Material-only comparison: strip the hot-spot list so NEE never fires.
    scene_nolights = scene._replace(
        light_prims=scene.light_prims[:0], light_weights=None,
        light_alias_prob=None, light_alias_idx=None)
    img_mat = render(scene_nolights, cam, CameraConfig(), SensorRGB(), args,
                     params=params)
    save_png(args.output.replace(".png", "-material-only.png"), img_mat)

    for name, im in (("MIS", img_mis), ("material-only", img_mat)):
        a = np.asarray(im)
        print(f"{name}: mean={a.mean():.4f} p99={np.percentile(a, 99):.3f} "
              f"max={a.max():.3f}")


if __name__ == "__main__":
    main()
