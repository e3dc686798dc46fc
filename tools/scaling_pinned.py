"""Pinned multi-process scaling measurement (VERDICT round-4 weakness 5).

The round-3 SCALING_cpu8 numbers ran 8 virtual devices on 2 shared physical
cores — explicitly non-evidence. This harness measures the real quantity a
2-worker jax.distributed render can show on this box: each OS process is
PINNED to its own physical core (sched_setaffinity + XLA host-device
inter/intra op threads = 1), renders its row shard of the same frame, and
the wall time is compared against a single process pinned the same way
rendering the whole frame. Parallel efficiency = T1 / (N * TN).

It also COUNTS the collective bytes the sharded step moves per frame (the
framebuffer all-gather; scene arrays are replicated at setup, outside the
timed loop) and projects the communication share on TPU ICI bandwidth — the
model BASELINE.md's >=85% target needs, since no second chip exists here.

Run: python tools/scaling_pinned.py          (spawns the pinned children)
     python tools/scaling_pinned.py --rank N --nproc N --out F  (child)
"""
import argparse
import json
import os
import subprocess
import sys
import time

PORT = 16493
W = H = 160
SSQRT = 2
DEPTH = 8
REPS = 3


def child(rank: int, nproc: int, out: str) -> int:
    # pin BEFORE jax initializes its thread pools
    os.sched_setaffinity(0, {rank % os.cpu_count()})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1"
                               + " --xla_cpu_multi_thread_eigen=false"
                               ).strip()
    os.environ["OMP_NUM_THREADS"] = "1"
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/wurblpt_jax_cache_pin{nproc}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    t_setup0 = time.perf_counter()
    if nproc > 1:
        from wurblpt_tpu.parallel.distributed import init_multihost

        assert init_multihost(coordinator_address=f"127.0.0.1:{PORT}",
                              num_processes=nproc, process_id=rank)
    import jax.numpy as jnp

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.parallel.distributed import make_global_mesh
    from wurblpt_tpu.parallel.sharding import render_frame_sharded
    from wurblpt_tpu.utils import scenes

    scene = scenes.cornell_box_ref().build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_ref_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=W, height=H)
    mesh = make_global_mesh()
    params = RenderParams(max_path_components=DEPTH)

    def run():
        img = render_frame_sharded(
            scene, static, cam, CameraConfig(), SensorRGB(),
            W, H, SSQRT, mesh=mesh, params=params)
        jax.block_until_ready(img)
        return img

    img = run()                     # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        img = run()
    dt = (time.perf_counter() - t0) / REPS

    if rank == 0:
        rec = {
            "nproc": nproc,
            "wall_s": dt,
            "paths": W * H * SSQRT * SSQRT,
            "paths_per_s": W * H * SSQRT * SSQRT / dt,
            "mean": float(np.asarray(img).mean()),
        }
        with open(out, "w") as f:
            json.dump(rec, f)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.rank is not None:
        sys.exit(child(args.rank, args.nproc, args.out))

    here = os.path.abspath(__file__)
    results = {}
    for nproc in (1, 2):
        outs = [f"/tmp/scaling_pin_{nproc}.json"]
        procs = []
        for rank in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, here, "--rank", str(rank),
                 "--nproc", str(nproc), "--out", outs[0]],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        rcs = [p.wait(timeout=3600) for p in procs]
        assert all(r == 0 for r in rcs), (nproc, rcs)
        with open(outs[0]) as f:
            results[nproc] = json.load(f)

    t1, t2 = results[1]["wall_s"], results[2]["wall_s"]
    eff = t1 / (2.0 * t2)
    assert abs(results[1]["mean"] - results[2]["mean"]) < 1e-6, (
        "sharded result mismatch", results)

    # Collective-byte model for the same step on TPU ICI: the only per-frame
    # collective is the framebuffer assembly of the row-sharded image
    # ([n_pix, 3] f32 all-gather; gradients in training add one psum of the
    # param pytree). v5e ICI ~ 4 links x 50 GB/s less protocol overhead; a
    # conservative 100 GB/s effective is assumed for the projection.
    bytes_gather = W * H * 3 * 4
    ici_bw = 100e9
    t_comm = bytes_gather / ici_bw
    # per-chip compute time for this frame on the measured TPU (cornell
    # 27 Mrays/s ~ 3.4 Mpaths/s from BENCH): t_compute = paths / (N * rate)
    tpu_paths_per_s = 3.4e6
    paths = W * H * SSQRT * SSQRT
    proj = {}
    for n in (2, 4, 8):
        t_cmp = paths / (n * tpu_paths_per_s)
        proj[n] = t_cmp / (t_cmp + t_comm)
    rec = {
        "harness": "tools/scaling_pinned.py (1 OS process per PHYSICAL core, "
                   "sched_setaffinity, single-threaded XLA host devices, "
                   "jax.distributed row-sharded render)",
        "frame": {"w": W, "h": H, "ssqrt": SSQRT, "depth": DEPTH},
        "pinned_1proc": results[1],
        "pinned_2proc": results[2],
        "parallel_efficiency_2proc_cpu": round(eff, 4),
        "collective_bytes_per_frame": bytes_gather,
        "ici_model": {
            "assumed_effective_bw_GBps": 100,
            "per_chip_paths_per_s_tpu": tpu_paths_per_s,
            "projected_efficiency": {str(k): round(v, 4)
                                     for k, v in proj.items()},
            "note": "communication is one [n_pix,3] f32 all-gather per frame; "
                    "compute/comm ratio stays >0.999 for bench-size frames, "
                    "so the >=85% BASELINE target is comm-feasible; the CPU "
                    "measurement above bounds the orchestration overhead.",
        },
    }
    print(json.dumps(rec, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(here)),
                           "SCALING_r05.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
