"""A/B cost profiling for the rtiow and envmap bench configs (VERDICT round-3
"Weak #3": 5.15 / 3.11 Mrays/s vs 16.3 on the same MXU intersector, with no
recorded explanation). Each variant runs in its own process (axon
cross-program fault, PROFILE.md section 3): invoke with --variant NAME.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def _frame(scene, static, cam, cfg, w, h, ssqrt, depth=8):
    import jax

    from wurblpt_tpu import RenderParams, SensorRGB
    from wurblpt_tpu.render.integrator import render_frame_wavefront

    params = RenderParams(max_path_components=depth)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, cfg, SensorRGB(), w, h, ssqrt,
        params=params, return_stats=True))
    out = fn(scene, cam)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    img, stats = out
    stats = np.asarray(stats)
    return {"frame_ms": dt * 1e3, "mrays_per_s": float(stats[1] / dt / 1e6),
            "mean_radiance": float(np.asarray(img).mean())}


def rtiow_variant(name):
    from wurblpt_tpu import CameraConfig, SceneStatic, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import DistortionModel
    from wurblpt_tpu.utils import scenes

    w, h, ssqrt = 192, 128, 4
    scene = scenes.rtiow().build()
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((13.0, 2.0, 3.0), (0.0, 0.0, 0.0))
    kwargs = dict(transformation=pose, vfov_deg=30.0, width=w, height=h)
    if name != "no_distortion":
        kwargs.update(dist_k=(-0.1, 0.02, 0.0, 0.0, 0.0, 0.0),
                      dist_p=(0.001, -0.001))
    cam = make_camera(**kwargs)
    cfgs = {
        "full": CameraConfig(distortion=DistortionModel.OPENCV),
        "iters8": CameraConfig(distortion=DistortionModel.OPENCV, undistort_iters=8),
        "iters4": CameraConfig(distortion=DistortionModel.OPENCV, undistort_iters=4),
        "no_distortion": CameraConfig(),
    }
    return _frame(scene, static, cam, cfgs[name], w, h, ssqrt)


def envmap_variant(name):
    from wurblpt_tpu import CameraConfig, SceneStatic, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.utils import scenes

    w = h = 128
    ssqrt = 4
    cube = name in ("full", "cube_no_is")
    res = 0 if name == "cube_no_is" else 64
    scene = scenes.envmap_spheres(cube=cube, importance_resolution=res).build()
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((0.0, 0.6, 4.0), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=40.0, width=w, height=h)
    return _frame(scene, static, cam, CameraConfig(), w, h, ssqrt)


VARIANTS = {
    "rtiow_full": lambda: rtiow_variant("full"),
    "rtiow_iters8": lambda: rtiow_variant("iters8"),
    "rtiow_iters4": lambda: rtiow_variant("iters4"),
    "rtiow_no_distortion": lambda: rtiow_variant("no_distortion"),
    "envmap_full": lambda: envmap_variant("full"),
    "envmap_equirect_is": lambda: envmap_variant("equirect"),
    "envmap_cube_no_is": lambda: envmap_variant("cube_no_is"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    args = ap.parse_args()
    if args.variant:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache")
        r = VARIANTS[args.variant]()
        print("PROFILE_RESULT:" + json.dumps({args.variant: r}))
        return 0
    for name in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", name],
            capture_output=True, text=True, timeout=1500)
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("PROFILE_RESULT:"):
                print(line[len("PROFILE_RESULT:"):])
                break
        else:
            print(json.dumps({name: {"error": proc.returncode,
                                     "tail": (proc.stderr or "")[-300:]}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
