"""Raw BVH cast micro-benchmark on the attached device (terrain_city, 102k
tris): closest-hit and any-hit cast times for the binary threaded walk vs the
wide-node short-stack walk (accel/traverse). One config per flag to keep each
device program alone in its process (PROFILE.md section 3)."""
import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wide", type=int, default=1)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--leaf", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=76800)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    os.environ["WURBLPT_BVH_WIDE"] = str(args.wide)
    os.environ["WURBLPT_BVH_WIDTH"] = str(args.width)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    from wurblpt_tpu.accel.traverse import bvh_closest_hit, bvh_any_hit, BIG
    from wurblpt_tpu.utils import scenes

    os.environ["WURBLPT_BVH_LEAF"] = str(args.leaf)
    scene = scenes.terrain_city(seed=3).build(use_bvh=True)
    print(f"tris={scene.n_tris} wide={scene.bvh.wide_nodes is not None} "
          f"nodes={scene.bvh.node_f.shape[0]}"
          + (f" wide_nodes={scene.bvh.wide_nodes.shape}"
             f" stackD={scene.bvh.wide_meta.shape[0]}"
             if scene.bvh.wide_nodes is not None else ""))

    # camera-like rays from the bench pose
    rs = np.random.RandomState(1)
    N = args.lanes
    o = np.broadcast_to(np.array([14.0, 9.0, 14.0], np.float32), (N, 3)).copy()
    tgt = np.array([0.0, 0.5, 0.0], np.float32)
    fwd = tgt - o[0]
    fwd /= np.linalg.norm(fwd)
    d = fwd[None] + rs.uniform(-0.35, 0.35, (N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full((N,), 1e-4)
    tmax = jnp.full((N,), BIG)

    fc = jax.jit(lambda o, d: bvh_closest_hit(scene, o, d, tmin, tmax))
    fa = jax.jit(lambda o, d: bvh_any_hit(scene, o, d, tmin, tmax))

    for name, fn in [("closest", fc), ("anyhit", fa)]:
        out = fn(o_j, d_j)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(o_j, d_j)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        extra = ""
        if name == "closest":
            extra = f" hits={int((np.asarray(out[1])>=0).sum())}"
        else:
            extra = f" occ={int(np.asarray(out).sum())}"
        print(f"{name}: {dt*1e3:.1f} ms ({dt/N*1e9:.0f} ns/ray){extra}")


if __name__ == "__main__":
    sys.exit(main())
