"""Benchmark: path-tracing throughput on the attached accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric (BASELINE config 1): measured Mrays/s on the Cornell box
128x128 / 16 spp — the EXACT reference scene (utils/cornell_data.py), rendered
with the persistent-lane wavefront. "Rays" are counted INSIDE the loop
(closest-hit casts + NEE shadow casts, integrator._make_bounce_fn stats), the
same work unit the reference's tracePath performs per BVH traversal.

vs_baseline = our paths/s over the measured reference CPU paths/s on this
machine (BASELINE.json "published", parity/src/parity_cornell.cpp build).

aux carries the remaining configs: RTIOW + OpenCV-distortion camera (config 2),
envmap + cube-map importance sampling furnace (config 3), ToF AMCW phase image
(config 4), a >100k-triangle BVH scene, and a >=64-emitter city scene.

EACH CONFIG RUNS IN A FRESH SUBPROCESS. On the experimental `axon` TPU
platform, running a second *different* wavefront program in one process fails
at block_until_ready with `INVALID_ARGUMENT: TPU backend error` (isolated in
round 2: cornell-then-rtiow reproduces it, each config alone succeeds).
Subprocess isolation makes the record whole regardless of that platform bug;
the persistent compilation cache keeps the per-config compile cost one-time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def bench_cornell():
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes

    width = height = 128
    ssqrt = 4
    spp = ssqrt * ssqrt
    scene = scenes.cornell_box_ref().build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_ref_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=width, height=height)
    params = RenderParams(max_path_components=8)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, CameraConfig(), SensorRGB(), width, height, ssqrt,
        params=params, return_stats=True))
    dt, (img, stats) = _timeit(fn, scene, cam)
    stats = np.asarray(stats)
    n_paths = width * height * spp
    return {
        "frame_ms": dt * 1e3,
        "paths_per_s": n_paths / dt,
        "closest_casts": int(stats[0]),
        "total_casts": int(stats[1]),
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_radiance": float(np.asarray(img).mean()),
    }


def bench_rtiow():
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.render.camera import DistortionModel
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes

    width, height = 192, 128
    ssqrt = 4
    scene = scenes.rtiow().build()
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((13.0, 2.0, 3.0), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=30.0, width=width,
                      height=height,
                      dist_k=(-0.1, 0.02, 0.0, 0.0, 0.0, 0.0),
                      dist_p=(0.001, -0.001))
    # undistort_iters=8 measured bit-identical to 32 ON THIS CONFIG
    # (PROFILE.md 1b); the public default stays 32 for strong coefficients.
    cfg = CameraConfig(distortion=DistortionModel.OPENCV, undistort_iters=8)
    params = RenderParams(max_path_components=8)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, cfg, SensorRGB(), width, height, ssqrt,
        params=params, return_stats=True))
    dt, (img, stats) = _timeit(fn, scene, cam)
    stats = np.asarray(stats)
    return {
        "frame_ms": dt * 1e3,
        "paths_per_s": width * height * ssqrt * ssqrt / dt,
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_radiance": float(np.asarray(img).mean()),
    }


def bench_envmap_furnace():
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes

    width = height = 128
    ssqrt = 4
    scene = scenes.envmap_spheres(cube=True).build()
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((0.0, 0.6, 4.0), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=40.0, width=width, height=height)
    params = RenderParams(max_path_components=8)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, CameraConfig(), SensorRGB(), width, height, ssqrt,
        params=params, return_stats=True))
    dt, (img, stats) = _timeit(fn, scene, cam)
    stats = np.asarray(stats)
    return {
        "frame_ms": dt * 1e3,
        "paths_per_s": width * height * ssqrt * ssqrt / dt,
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_radiance": float(np.asarray(img).mean()),
    }


def bench_tof():
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.render.sensor import SensorTofAmcw
    from wurblpt_tpu.utils import scenes

    width = height = 96
    ssqrt = 4
    scene = scenes.tof_box().build()
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((0.0, 0.0, 1.19), (0.0, 0.0, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=60.0, width=width, height=height)
    sensor = SensorTofAmcw(phase_index=0)
    params = RenderParams(max_path_components=6)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, CameraConfig(), sensor, width, height, ssqrt,
        params=params, return_stats=True))
    dt, (img, stats) = _timeit(fn, scene, cam)
    stats = np.asarray(stats)
    img_np = np.asarray(img)
    # Guard against a silently dark capture (round-4 found the ToF light
    # facing out of the room; throughput alone cannot catch that).
    assert (img_np != 0).mean() > 0.5, "ToF frame is dark"
    return {
        "frame_ms": dt * 1e3,
        "paths_per_s": width * height * ssqrt * ssqrt / dt,
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_energy_j": float(img_np.mean()),
    }


def bench_bvh_large():
    """>100k-triangle scene through the BVH path (VERDICT round 1 item 1/6)."""
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes

    width, height = 160, 120
    ssqrt = 2
    scene = scenes.terrain_city(seed=3).build(use_bvh=True)
    static = SceneStatic.from_scene(scene)
    pose = from_lookat((14.0, 9.0, 14.0), (0.0, 0.5, 0.0))
    cam = make_camera(transformation=pose, vfov_deg=45.0, width=width, height=height)
    params = RenderParams(max_path_components=4)
    fn = jax.jit(lambda s, c: render_frame_wavefront(
        s, static, c, CameraConfig(), SensorRGB(), width, height, ssqrt,
        params=params, return_stats=True))
    dt, (img, stats) = _timeit(fn, scene, cam, n=3)
    stats = np.asarray(stats)
    return {
        "n_tris": scene.n_tris,
        "frame_ms": dt * 1e3,
        "paths_per_s": width * height * ssqrt * ssqrt / dt,
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_radiance": float(np.asarray(img).mean()),
    }


def bench_city_many_lights():
    """BASELINE config 5 (single-chip variant): Sponza-class composition —
    >200k-tri OBJ/MTL round-tripped scene, 96 emissive windows (alias-table
    light picking), ModPhong/GGX/mirror/RGL materials, 1080p 360-degree
    STEREO camera, BVH traversal. Saves an image artifact with provenance
    metadata (artifacts/city_night.png)."""
    import jax

    from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
    from wurblpt_tpu.core.transform import from_lookat
    from wurblpt_tpu.render.camera import SurroundMode
    from wurblpt_tpu.render.integrator import render_frame_wavefront
    from wurblpt_tpu.utils import scenes
    from wurblpt_tpu.utils.metadata import save_png_with_metadata, timed_render

    # 1 spp + 65536-lane blocks keep every device execution under the axon
    # fault horizon (PROFILE.md section 3); throughput is what is measured.
    width, height = 1920, 1080
    ssqrt = 1
    scene = scenes.city_night(seed=7).build(use_bvh=True)
    static = SceneStatic.from_scene(scene)
    cam = make_camera(
        transformation=from_lookat((0.0, 3.5, 14.0), (0.0, 1.5, 0.0)),
        vfov_deg=50.0, width=width, height=height, eye_distance=0.065)
    cfg = CameraConfig(surround=SurroundMode.S360, stereo=True)
    params = RenderParams(max_path_components=4)

    # host_blocks: one device execution per 131072-lane block — a single
    # multi-minute execution faults the axon device (PROFILE.md section 3).
    def fn(s, c):
        return render_frame_wavefront(
            s, static, c, cfg, SensorRGB(), width, height, ssqrt,
            params=params, return_stats=True, host_blocks=True,
            max_lanes=65536)

    with timed_render(spp=ssqrt * ssqrt, params=params, width=width,
                      height=height, scene="city_night") as st:
        dt, (img, stats) = _timeit(fn, scene, cam, n=1)
        st.total_casts = int(np.asarray(stats)[1])
    st.wall_seconds = dt
    st.mrays_per_s = st.total_casts / dt / 1e6
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "artifacts"), exist_ok=True)
    save_png_with_metadata(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts", "city_night.png"), np.asarray(img), st)
    stats = np.asarray(stats)
    return {
        "n_tris": scene.n_tris,
        "n_lights": int(scene.light_prims.shape[0]),
        "frame_ms": dt * 1e3,
        "paths_per_s": width * height * ssqrt * ssqrt / dt,
        "mrays_per_s": stats[1] / dt / 1e6,
        "mean_radiance": float(np.asarray(img).mean()),
    }


CONFIGS = {
    "cornell": bench_cornell,
    "rtiow_distortion": bench_rtiow,
    "envmap_cube_is": bench_envmap_furnace,
    "tof_amcw": bench_tof,
    "bvh_100k": bench_bvh_large,
    "city_many_lights": bench_city_many_lights,
}


def _run_config(name: str):
    """Child-process entry: run ONE config and print its result JSON."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache")
    result = CONFIGS[name]()
    result["device"] = jax.devices()[0].device_kind
    print("WURBLPT_BENCH_RESULT:" + json.dumps(result))


CONFIG_TIMEOUTS = {"city_many_lights": 2700.0, "bvh_100k": 1800.0}


def _spawn_config(name: str, timeout_s: float = 1200.0):
    """Run one config in a fresh interpreter; return its result dict."""
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--config", name],
        capture_output=True, text=True, timeout=timeout_s, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("WURBLPT_BENCH_RESULT:"):
            return json.loads(line[len("WURBLPT_BENCH_RESULT:"):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-6:]
    return {"error": f"rc={proc.returncode}: " + " | ".join(tail)}


def main():
    aux = {}
    for name in CONFIGS:
        try:
            aux[name] = _spawn_config(name, CONFIG_TIMEOUTS.get(name, 1200.0))
        except subprocess.TimeoutExpired:
            aux[name] = {"error": "timeout"}
        except Exception as e:  # a failing config must not kill the bench
            aux[name] = {"error": f"{type(e).__name__}: {e}"}
    aux["device"] = aux.get("cornell", {}).pop("device", "unknown")
    for name in CONFIGS:
        if isinstance(aux.get(name), dict):
            aux[name].pop("device", None)

    cornell = aux.get("cornell", {})
    pub = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
    except Exception:
        pass
    # Per-config reference-CPU denominators (parity/src/parity_*.cpp builds,
    # measured on this machine) -> vs_ref_cpu ratio on every row.
    ref_keys = {
        "cornell": "cornell128_16spp_ref_cpu_paths_per_s",
        "rtiow_distortion": "rtiow_192x128_16spp_ref_cpu_paths_per_s",
        "envmap_cube_is": "envmap_cube_is_128_16spp_ref_cpu_paths_per_s",
        "tof_amcw": "tof_96_16spp_ref_cpu_paths_per_s",
        "bvh_100k": "bvh100k_160x120_4spp_ref_cpu_paths_per_s",
        "city_many_lights": "city_1080p_360stereo_1spp_ref_cpu_paths_per_s",
    }
    for name, key in ref_keys.items():
        row = aux.get(name)
        ref = float(pub.get(key, 0.0))
        if isinstance(row, dict) and "paths_per_s" in row and ref > 0:
            row["ref_cpu_paths_per_s"] = ref
            row["vs_ref_cpu"] = round(row["paths_per_s"] / ref, 3)
    baseline = float(pub.get("cornell128_16spp_ref_cpu_paths_per_s", 0.0))
    paths_per_s = float(cornell.get("paths_per_s", 0.0))
    vs = paths_per_s / baseline if baseline > 0 else 0.0

    print(json.dumps({
        "metric": "cornell128_16spp_mrays_per_s",
        "value": round(float(cornell.get("mrays_per_s", 0.0)), 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
        "aux": aux,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        _run_config(sys.argv[2])
    else:
        main()
