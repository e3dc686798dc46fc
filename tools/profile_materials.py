"""In-loop material-dispatch ablation: how much of the rtiow/envmap frame is
each masked BSDF branch? Compiles the frame with a material type's branch
REMOVED from SceneStatic.mat_types (lanes of that type absorb — radiance is
wrong, time is the datum). One variant per process (axon cross-program
fault). Run after a bench finishes; never concurrently with other TPU work.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

VARIANTS = ("full", "no_glass", "no_ggx", "no_mirror", "no_env_nee",
            "no_textures")


def run(config, variant):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache_mat")
    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import DistortionModel
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.scene.ir import MaterialType
    from wurblpt_tpu.utils import scenes

    if config == "rtiow":
        w, h, ssqrt = 192, 128, 4
        scene = scenes.rtiow().build()
        cam = make_camera(transformation=from_lookat((13.0, 2.0, 3.0), (0, 0, 0)),
                          vfov_deg=30.0, width=w, height=h,
                          dist_k=(-0.1, 0.02, 0.0, 0.0, 0.0, 0.0),
                          dist_p=(0.001, -0.001))
        cfg = CameraConfig(distortion=DistortionModel.OPENCV)
    else:
        w = h = 128
        ssqrt = 4
        scene = scenes.envmap_spheres(cube=True).build()
        cam = make_camera(transformation=from_lookat((0.0, 0.6, 4.0), (0, 0, 0)),
                          vfov_deg=40.0, width=w, height=h)
        cfg = CameraConfig()
    static = SceneStatic.from_scene(scene)
    drop = {"no_glass": MaterialType.GLASS, "no_ggx": MaterialType.GGX,
            "no_mirror": MaterialType.MIRROR}
    if variant in drop:
        static = static._replace(
            mat_types=frozenset(static.mat_types - {drop[variant]}))
    elif variant == "no_env_nee":
        static = static._replace(env_importance=False)
    elif variant == "no_textures":
        static = static._replace(has_textures=False)
    params = RenderParams(max_path_components=8)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, cfg, SensorRGB(), w, h, ssqrt, params=params))
    out = fn(scene, cam)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    return {"frame_ms": dt * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rtiow", choices=("rtiow", "envmap"))
    ap.add_argument("--variant")
    args = ap.parse_args()
    if args.variant:
        r = run(args.config, args.variant)
        print("MAT_RESULT:" + json.dumps({args.variant: r}))
        return 0
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", args.config,
             "--variant", v],
            capture_output=True, text=True, timeout=1500)
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("MAT_RESULT:"):
                print(f"{args.config}: " + line[len("MAT_RESULT:"):])
                break
        else:
            print(json.dumps({v: {"rc": proc.returncode,
                                  "tail": (proc.stderr or "")[-200:]}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
