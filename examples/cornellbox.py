"""Cornell box (reference app: wurblpt-cornellbox.cpp).

Material variants for the tall box / short object, URQ tonemap + sRGB output,
live progress reporting, and provenance metadata stamped on the PNG (the
reference's TGD CPU_SECONDS/SAMPLES_PER_PIXEL tags, wurblpt.hpp:425-435).
"""

import sys

import numpy as np

from _common import default_parser, setup_platform


def main():
    p = default_parser("cornellbox", width=256, height=256, ssqrt=6, depth=16)
    p.add_argument("--tall-box", default="white", choices=("white", "mirror"))
    p.add_argument("--short-object", default="box",
                   choices=("box", "sphere", "glass_sphere"))
    args = p.parse_args()
    setup_platform(args)

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera, render_frame_progressive)
    from wurblpt_tpu.utils import scenes
    from wurblpt_tpu.utils.metadata import save_png_with_metadata, timed_render

    scene = scenes.cornell_box(tall_box=args.tall_box,
                               short_object=args.short_object).build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov,
                      width=args.width, height=args.height)
    params = RenderParams(max_path_components=args.max_depth)
    spp = args.samples_sqrt ** 2

    def progress(done, total, _preview):
        print(f"\r{100 * done // total:3d}% ({done}/{total} passes)",
              end="", file=sys.stderr, flush=True)

    with timed_render(spp=spp, params=params, width=args.width,
                      height=args.height, scene="cornellbox",
                      tall_box=args.tall_box,
                      short_object=args.short_object) as st:
        img = render_frame_progressive(
            scene, static, cam, CameraConfig(), SensorRGB(),
            args.width, args.height, args.samples_sqrt, params=params,
            samples_per_pass=min(4, spp), progress_cb=progress)
    print(file=sys.stderr)
    save_png_with_metadata(args.output, np.asarray(img), st)
    print(f"wrote {args.output} ({st.wall_seconds:.1f}s wall)")


if __name__ == "__main__":
    main()
