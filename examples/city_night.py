"""Sponza-class showcase (reference app: wurblpt-sponza.cpp:73-143 workflow):
the >200k-triangle city_night scene — OBJ/MTL round trip, 96 emissive windows
(power-proportional alias-table light picking), ModPhong/GGX/mirror/RGL
materials — rendered 360-degree stereo through the BVH, with provenance
metadata stamped on the output PNG.
"""

import numpy as np

from _common import default_parser, setup_platform


def main():
    p = default_parser("city_night", width=1024, height=1024, ssqrt=2, depth=4)
    p.add_argument("--mono", action="store_true", help="disable stereo")
    p.add_argument("--small", action="store_true",
                   help="reduced scene for quick CPU runs")
    args = p.parse_args()
    setup_platform(args)

    import jax

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import SurroundMode
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes
    from wurblpt_tpu.utils.metadata import save_png_with_metadata, timed_render

    kw = dict(terrain_res=120, n_buildings=90, n_windows=72,
              sphere_slices=16) if args.small else {}
    built = scenes.city_night(seed=7, **kw).build(use_bvh=True)
    static = SceneStatic.from_scene(built)
    print(f"scene: {built.n_tris} tris, {built.light_prims.shape[0]} light prims")

    cam = make_camera(
        transformation=from_lookat((0.0, 3.5, 14.0), (0.0, 1.5, 0.0)),
        vfov_deg=50.0, width=args.width, height=args.height,
        eye_distance=0.065)
    cfg = CameraConfig(surround=SurroundMode.S360, stereo=not args.mono)
    params = RenderParams(max_path_components=args.max_depth)

    with timed_render(spp=args.samples_sqrt ** 2, params=params,
                      width=args.width, height=args.height,
                      scene="city_night") as st:
        img, stats = render_frame_wavefront(
            built, static, cam, cfg, SensorRGB(), args.width, args.height,
            args.samples_sqrt, params=params, return_stats=True)
        img = np.asarray(img)
        st.total_casts = int(np.asarray(stats)[1])
    tags = save_png_with_metadata(args.output, img, st)
    print(f"{st.mrays_per_s:.2f} Mrays/s, wall {st.wall_seconds:.1f}s")


if __name__ == "__main__":
    main()
