"""Shared driver for the asset-gated OBJ scene apps (sponza / bistro /
san-miguel / rungholt — reference apps wurblpt-sponza.cpp etc.).

The reference ships these as ~100-line mains over external OBJ assets from
casual-effects.com that this sandbox cannot fetch; each app here reproduces
the reference's import transform, camera, environment and quality settings,
and SKIPS WITH A MESSAGE when the asset path is absent (capability itself is
covered in CI by the city round-trip scene, tests/test_parity_city.py).
"""
import os
import sys

import numpy as np

from _common import default_parser, setup_platform


def run_obj_app(name, spec):
    p = default_parser(name, width=480, height=270, ssqrt=4, depth=6)
    p.add_argument("asset", nargs="?", default=os.environ.get(
        f"WURBLPT_{name.upper().replace('-', '_')}_OBJ", ""))
    p.add_argument("--surround", choices=("off", "180", "360"), default="off")
    p.add_argument("--stereo", action="store_true")
    args = p.parse_args()
    if not args.asset or not os.path.exists(args.asset):
        print(f"{name}: asset not found ({args.asset or 'no path given'}).\n"
              f"Download the OBJ scene (casual-effects.com/data) and pass its "
              f"path, e.g.  python examples/{name.replace('-', '_')}.py "
              f"/path/to/{spec.get('asset_hint', name + '.obj')}",
              file=sys.stderr)
        return 0
    setup_platform(args)

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.core.transform import Transformation
    from wurblpt_tpu.io.obj import import_into_scene
    from wurblpt_tpu.render.camera import SurroundMode
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.scene.builder import Scene
    from wurblpt_tpu.utils.metadata import save_png_with_metadata, timed_render

    scene_b = Scene()
    n = import_into_scene(scene_b, args.asset,
                          transformation=spec.get("transform"),
                          import_bits=spec.get("import_bits", 0))
    print(f"{name}: imported {n} instances from {args.asset}", file=sys.stderr)
    if spec.get("extra_content"):
        spec["extra_content"](scene_b)
    if spec.get("envmap"):
        scene_b.set_environment_map(spec["envmap"]())
    scene = scene_b.build(use_bvh=True)
    static = SceneStatic.from_scene(scene)

    cam = make_camera(transformation=spec["camera"](),
                      vfov_deg=spec.get("vfov", 45.0),
                      width=args.width, height=args.height,
                      eye_distance=0.07)
    surround = {"off": SurroundMode.OFF, "180": SurroundMode.S180,
                "360": SurroundMode.S360}[args.surround]
    cfg = CameraConfig(surround=surround, stereo=args.stereo)
    params = RenderParams(max_path_components=args.max_depth)

    with timed_render(spp=args.samples_sqrt ** 2, params=params,
                      width=args.width, height=args.height, scene=name) as st:
        img = render_frame_wavefront(
            scene, static, cam, cfg, SensorRGB(),
            args.width, args.height, args.samples_sqrt, params=params,
            host_blocks=True)
    save_png_with_metadata(args.output, np.asarray(img), st)
    print(f"wrote {args.output} ({st.wall_seconds:.1f}s wall)")
    return 0
