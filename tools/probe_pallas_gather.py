"""Probe Mosaic's dynamic gather support: can a Pallas TPU kernel index a
VMEM-resident table with per-lane indices? Decides whether the BVH traversal
can live entirely in VMEM (per-ray node walks) or must stay in XLA."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/wurblpt_jax_cache")


def probe(name, kernel, table, idx, expect):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(expect.shape, expect.dtype),
        )(table, idx)
        ok = np.allclose(np.asarray(out), expect)
        print(f"{name}: OK correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def main():
    K, L = 512, 128
    rs = np.random.RandomState(0)
    table = rs.randn(K, L).astype(np.float32)
    idx = rs.randint(0, K, (8, L)).astype(np.int32)
    idx_rows = rs.randint(0, K, (256,)).astype(np.int32)

    # 1. take_along_axis over sublanes: out[i, j] = table[idx[i, j], j]
    def k1(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    probe("take_along_axis axis=0 [8,128]", k1, table, idx,
          np.take_along_axis(table, idx, axis=0))

    # 2. row gather: out[i, :] = table[idx_rows[i], :]
    def k2(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:], :]

    probe("row gather table[idx,:] [256]", k2, table, idx_rows,
          table[idx_rows])

    # 3. jnp.take rows
    def k3(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    probe("jnp.take axis=0 rows [256]", k3, table, idx_rows, table[idx_rows])

    # 4. lane-wise gather on a 1-D table broadcast: out[i,j] = vec[idx[i,j]]
    vec = rs.randn(K).astype(np.float32)

    def k4(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    probe("jnp.take 1d vec [8,128] idx", k4, vec, idx, vec[idx])


if __name__ == "__main__":
    main()
