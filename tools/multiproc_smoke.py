"""Real >=2-process jax.distributed smoke run on localhost CPU (VERDICT
round-3 Missing #4: init_multihost had never executed with >1 process — the
analog of `mpirun -np 2` smoke-testing mpi.hpp:189-203).

Each process gets 2 virtual CPU devices (4 global), brings up the cluster via
init_multihost, builds the global mesh, renders the Cornell box with the
framebuffer row-sharded over all 4 devices, and checks ITS OWN local rows
bit-identical against a single-process reference render computed locally.
Process 0 writes a JSON record.

Run: python tools/multiproc_smoke.py            (spawns both children)
     python tools/multiproc_smoke.py --rank N   (child entry)
"""
import argparse
import json
import os
import subprocess
import sys

PORT = 16471
NPROC = 2


def child(rank: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Bring up the cluster BEFORE importing wurblpt_tpu: package import
    # builds device constants (RGL/color tables), which initializes the XLA
    # backend — jax.distributed.initialize must run first (the same rule as
    # MPI_Init-before-anything, mpi.hpp:189-203).
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wurblpt_tpu.parallel.distributed import init_multihost  # jax-only import

    active = init_multihost(coordinator_address=f"127.0.0.1:{PORT}",
                            num_processes=NPROC, process_id=rank)
    assert active, "distributed bring-up failed"
    from wurblpt_tpu.parallel.distributed import (
        local_shard_rows, make_global_mesh)
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == 2 * NPROC, jax.devices()

    from wurblpt_tpu import (CameraConfig, RenderParams, SceneStatic,
                             SensorRGB, make_camera)
    from wurblpt_tpu.parallel.sharding import render_frame_sharded
    from wurblpt_tpu.render.integrator import render_frame
    from wurblpt_tpu.utils import scenes

    w = h = 32
    scene = scenes.cornell_box().build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=w, height=h)
    params = RenderParams(max_path_components=4)

    mesh = make_global_mesh()
    img = render_frame_sharded(scene, static, cam, CameraConfig(), SensorRGB(),
                               w, h, 2, mesh=mesh, params=params)
    # Each process can only address ITS OWN shards of the global array.
    start, count = local_shard_rows(h, mesh)
    assert count == h // NPROC, (start, count)
    local_rows = np.concatenate(
        [np.asarray(s.data) for s in sorted(
            (s for s in img.addressable_shards), key=lambda s: s.index[0].start)])

    ref = np.asarray(render_frame(scene, static, cam, CameraConfig(),
                                  SensorRGB(), w, h, 2, params=params))
    np.testing.assert_array_equal(local_rows, ref[start:start + count])

    if rank == 0:
        rec = {"processes": NPROC, "global_devices": len(jax.devices()),
               "rows_checked_per_proc": int(count),
               "bit_identical_vs_single_process": True}
        print("MULTIPROC_RESULT:" + json.dumps(rec))
    jax.distributed.shutdown()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is not None:
        return child(args.rank)

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in range(NPROC)]
    ok = True
    out0 = ""
    for r, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
            print(f"rank {r} rc={p.returncode}:\n{(err or '')[-2000:]}",
                  file=sys.stderr)
        if r == 0:
            out0 = out
    for line in out0.splitlines():
        if line.startswith("MULTIPROC_RESULT:"):
            print(line)
            break
    else:
        ok = False
        print("no result line from rank 0", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
