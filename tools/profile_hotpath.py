"""Microbenchmark of the render hot path on the attached accelerator.

Times each stage of the wavefront loop separately to locate the bottleneck:
camera-ray gen, one closest-hit cast, hit assembly, BSDF sample/eval, RNG
draws, full bounce body (via trace_paths at depth 1/2), and the whole frame.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache")

from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
from wurblpt_tpu.core.rng import Salt, uniform1, uniform4
from wurblpt_tpu.render.bsdf import bsdf_eval, bsdf_sample
from wurblpt_tpu.render.camera import camera_rays
from wurblpt_tpu.render.integrator import render_frame, trace_paths
from wurblpt_tpu.render.intersect import BIG, assemble_hit, scene_raw_hit
from wurblpt_tpu.utils import scenes


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    width = height = 128
    ssqrt = 4
    spp = ssqrt * ssqrt
    n = width * height * spp  # 262144 rays, all samples in one batch

    scene = scenes.cornell_box_ref().build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_ref_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=width, height=height)
    sensor = SensorRGB()
    print(f"device={jax.devices()[0].device_kind} n_rays={n} "
          f"tris={scene.n_tris} spheres={scene.n_spheres}")

    pid = jnp.tile(jnp.arange(width * height, dtype=jnp.int32), spp)
    sid = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), width * height)
    px = (pid % width).astype(jnp.float32) + 0.5
    py = (pid // width).astype(jnp.float32) + 0.5
    pxy = jnp.stack([px, py], -1)
    zeros = jnp.zeros((n,))
    u2 = jnp.zeros((n, 2))

    cr = jax.jit(lambda c: camera_rays(c, CameraConfig(), pxy, width, height,
                                       jnp.float32(0), jnp.float32(0), zeros, u2))
    o, d, tm = cr(cam)
    timeit("camera_rays", cr, cam)

    tmin = jnp.full((n,), 1e-4)
    tmax = jnp.full((n,), BIG)
    cast = jax.jit(lambda s, o, d: scene_raw_hit(s, o, d, tmin, tmax))
    t, prim, uu, vv = cast(scene, o, d)
    timeit("scene_raw_hit (VPU tile cast)", cast, scene, o, d)

    from wurblpt_tpu.render.intersect_mxu import build_mxu_scene, mxu_closest_hit

    ms = build_mxu_scene(scene)
    castm = jax.jit(lambda o, d: mxu_closest_hit(ms, o, d, tmin, tmax)[:4])
    castm(o, d)
    timeit("mxu_closest_hit (MXU cast)", castm, o, d)

    asm = jax.jit(lambda s, o, d, t, p, uu, vv: assemble_hit(s, o, d, t, p, uu, vv))
    hr = asm(scene, o, d, t, prim, uu, vv)
    timeit("assemble_hit (gather)", asm, scene, o, d, t, prim, uu, vv)

    asm2 = jax.jit(lambda s, o, d, t, p, uu, vv: assemble_hit(
        s, o, d, t, p, uu, vv, ms=ms))
    asm2(scene, o, d, t, prim, uu, vv)
    timeit("assemble_hit (MXU onehot)", asm2, scene, o, d, t, prim, uu, vv)

    rng1 = jax.jit(lambda: uniform4(pid, sid, 3, Salt.BSDF))
    timeit("uniform4 (one RNG draw)", rng1)

    bs = jax.jit(lambda s, hr, d: bsdf_sample(
        s, static, hr, d, jnp.ones((n, 4)),
        uniform4(pid, sid, 0, Salt.BSDF),
        uniform1(pid, sid, 0, Salt.BSDF_LOBE),
        uniform1(pid, sid, 0, Salt.BSDF_CHANNEL)))
    sr = bs(scene, hr, d)
    timeit("bsdf_sample", bs, scene, hr, d)

    be = jax.jit(lambda s, hr, d: bsdf_eval(s, static, hr, d, -d))
    be(scene, hr, d)
    timeit("bsdf_eval", be, scene, hr, d)

    for depth in (1, 2, 4, 8):
        params = RenderParams(max_path_components=depth)
        tp = jax.jit(lambda s, o, d, _p=params: trace_paths(
            s, static, sensor, o, d, tm, pid, sid, _p))
        tp(scene, o, d)
        timeit(f"trace_paths depth={depth}", tp, scene, o, d, n=5)

    params = RenderParams(max_path_components=8)
    ff = jax.jit(lambda s, c: render_frame(
        s, static, c, CameraConfig(), sensor, width, height, ssqrt,
        params=params, samples_per_pass=16))
    ff(scene, cam)
    timeit("render_frame (16spp, depth 8)", ff, scene, cam, n=5)

    from wurblpt_tpu.render.integrator import render_frame_wavefront

    for ml in (65536, 131072, 262144):
        wf = jax.jit(lambda s, c, _ml=ml: render_frame_wavefront(
            s, static, c, CameraConfig(), sensor, width, height, ssqrt,
            params=params, max_lanes=_ml, return_stats=True))
        img, stats = wf(scene, cam)
        jax.block_until_ready(img)
        dt = timeit(f"render_frame_wavefront lanes={ml}", wf, scene, cam, n=5)
        st = np.asarray(stats)
        print(f"    casts closest={st[0]} total={st[1]} "
              f"-> {st[1] / dt / 1e6:.1f} Mrays/s, mean={float(np.asarray(img).mean()):.5f}")


if __name__ == "__main__":
    main()
