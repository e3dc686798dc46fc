"""City-config profiler: a SMALL city frame (the 1080p bench frame's cost is
~63 identical 65536-lane blocks, so a 2-block frame profiles the same program
at ~1/30 the wall time) with component toggles to attribute time.

Variants (one process per run, PROFILE.md section 3):
  --variant full       the bench composition at the small size
  --variant nolights   lights removed from flatten (no light NEE branch)
  --variant norgl      RGL sphere material swapped for GGX (no RGL in the
                       masked dispatch)
  --variant noenvis    envmap importance tables off (no env-NEE branch)
  --variant depth1     max_path_components=1

Usage: python tools/profile_city.py --variant full [--width 480 --height 270]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/wurblpt_jax_cache" if not args.cpu
                      else "/tmp/wurblpt_jax_cache_cpu1")
    import jax.numpy as jnp

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import SurroundMode
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes

    builder = scenes.city_night(seed=7)
    if args.variant == "norgl":
        from wurblpt_tpu.scene import builder as B

        # swap the RGL material for GGX on the same sphere
        for i, m in enumerate(builder._materials):
            if type(m).__name__ == "RGLMaterial":
                builder._materials[i] = B.GGX(albedo=(0.6, 0.6, 0.6),
                                              roughness=0.2)
    scene = builder.build(use_bvh=True)
    if args.variant == "nolights":
        scene = scene._replace(light_prims=scene.light_prims[:0])
    if args.variant == "noenvis":
        scene = scene._replace(envmap=scene.envmap._replace(
            alias_prob=scene.envmap.alias_prob[:0],
            alias_idx=scene.envmap.alias_idx[:0]))
    static = SceneStatic.from_scene(scene)
    depth = 1 if args.variant == "depth1" else 4
    params = RenderParams(max_path_components=depth)
    cam = make_camera(
        transformation=from_lookat((0.0, 3.5, 14.0), (0.0, 1.5, 0.0)),
        vfov_deg=50.0, width=args.width, height=args.height,
        eye_distance=0.065)
    cfg = CameraConfig(surround=SurroundMode.S360, stereo=True)

    def fn(s, c):
        return render_frame_wavefront(
            s, static, c, cfg, SensorRGB(), args.width, args.height, 1,
            params=params, return_stats=True, host_blocks=True,
            max_lanes=65536)

    img, stats = fn(scene, cam)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        img, stats = fn(scene, cam)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / args.reps
    paths = args.width * args.height
    print({
        "variant": args.variant,
        "frame_ms": round(dt * 1e3, 1),
        "paths_per_s": round(paths / dt, 1),
        "total_casts": int(np.asarray(stats)[1]),
        "mean_radiance": float(np.asarray(img).mean()),
    })


if __name__ == "__main__":
    main()
