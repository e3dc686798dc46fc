"""Pallas TPU kernel: fused ray-scene intersection (matmul + decode + reduce).

The jnp MXU intersector (render/intersect_mxu.py) computes the [N, C] feature
matmul fast, but the DECODE (validity masks, t ratios, min-reduction) is a
chain of elementwise ops over [N, C] that XLA materializes in HBM — at
C = 512 that is ~0.5 GB of traffic per intermediate and the cast is
memory-bound (~5.6 ms measured for N = 262144 on TPU v5e).

This kernel performs the whole cast per ray tile inside VMEM:

    HBM -> VMEM:  ray features [TR, 12], primitive features [12, C]
    MXU:          prod = rfeat @ feat            (f32, HIGHEST precision)
    VPU:          Moller-Trumbore / sphere-quadratic decode + closest reduce
    VMEM -> HBM:  [TR, 4] packed (t, u, v, prim)

so the [TR, C] intermediates never leave the chip. Same math as
``intersect_mxu.mxu_closest_hit`` (reference semantics:
``hitable_triangle.hpp:189-274``, ``hitable_sphere.hpp:128-151``); the unit
test asserts elementwise agreement with the jnp path.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Host scalar, NOT jnp: a module-level device array becomes a hoisted
# const_arg in every program that closes over it (jax 0.9.0 drops those
# on cross-program re-dispatch; see tests/conftest.py).
BIG = np.float32(3.0e37)
_BIGF = 3.0e37  # plain float for in-kernel use (jnp scalars become captured consts)
_HI = jax.lax.Precision.HIGHEST


def _intersect_kernel(rfeat_ref, dd_ref, tmm_ref, feat_ref, out_ref,
                      *, kt, ks, n_tris, n_spheres, precision=_HI):
    rfeat = rfeat_ref[:]                      # [TR, 12]
    tr = rfeat.shape[0]
    if precision == "split3":
        # Manual 3-pass split-float product: f32 = hi(bf16) + lo(bf16) on both
        # operands, drop the lo*lo term. ~f32 accuracy at half the MXU passes
        # of HIGHEST (Mosaic does not support Precision.HIGH).
        feat = feat_ref[:]
        r_hi = rfeat.astype(jnp.bfloat16)
        r_lo = (rfeat - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_hi = feat.astype(jnp.bfloat16)
        f_lo = (feat - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dflt = jax.lax.Precision.DEFAULT
        prod = (
            jnp.dot(r_hi, f_hi, preferred_element_type=jnp.float32, precision=dflt)
            + jnp.dot(r_hi, f_lo, preferred_element_type=jnp.float32, precision=dflt)
            + jnp.dot(r_lo, f_hi, preferred_element_type=jnp.float32, precision=dflt)
        )
    else:
        prod = jnp.dot(rfeat, feat_ref[:], preferred_element_type=jnp.float32,
                       precision=precision)   # [TR, C]

    t_min = tmm_ref[:, 0][:, None]            # [TR, 1]
    t_max = tmm_ref[:, 1][:, None]

    best_t = jnp.full((tr, 1), _BIGF)
    best_prim = jnp.full((tr, 1), -1, jnp.int32)
    best_u = jnp.zeros((tr, 1))
    best_v = jnp.zeros((tr, 1))

    if kt:
        det = prod[:, 0 * kt:1 * kt]
        tn = prod[:, 1 * kt:2 * kt]
        un = prod[:, 2 * kt:3 * kt]
        vn = prod[:, 3 * kt:4 * kt]
        s = jnp.sign(det)
        ad = jnp.abs(det)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, kt), 1)
        valid = (
            (ad > 1e-12)
            & (un * s >= 0.0)
            & (vn * s >= 0.0)
            & ((un + vn) * s <= ad)
            & (tn * s > t_min * ad)
            & (tn * s < t_max * ad)
            & (k_ids < n_tris)
        )
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        t_all = jnp.where(valid, tn * inv_det, _BIGF)
        tk = jnp.min(t_all, 1, keepdims=True)
        oh = t_all <= tk
        k = jnp.min(jnp.where(oh, k_ids, jnp.int32(0x7FFFFFFF)), 1, keepdims=True)
        onehot = (k_ids == k).astype(t_all.dtype)
        hit_tri = tk < _BIGF
        best_u = jnp.where(hit_tri, jnp.sum(un * inv_det * onehot, 1, keepdims=True), 0.0)
        best_v = jnp.where(hit_tri, jnp.sum(vn * inv_det * onehot, 1, keepdims=True), 0.0)
        best_t = jnp.where(hit_tri, tk, best_t)
        best_prim = jnp.where(hit_tri, k, best_prim)

    if ks:
        sph0 = 4 * kt
        half_b = prod[:, sph0:sph0 + ks]
        cq = prod[:, sph0 + ks:sph0 + 2 * ks]
        a = dd_ref[:, 0][:, None]             # |d|^2
        disc = half_b * half_b - a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = -(half_b + jnp.sign(half_b) * sq)
        t0 = q / jnp.maximum(a, 1e-20)
        t1 = cq / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
        tlo = jnp.minimum(t0, t1)
        thi = jnp.maximum(t0, t1)
        ts = jnp.where(tlo > t_min, tlo, thi)
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, ks), 1)
        valids = (
            (disc > 0.0) & (ts > t_min) & (ts < t_max) & (j_ids < n_spheres)
        )
        ts = jnp.where(valids, ts, _BIGF)
        tj = jnp.min(ts, 1, keepdims=True)
        ohs = ts <= tj
        j = jnp.min(jnp.where(ohs, j_ids, jnp.int32(0x7FFFFFFF)), 1, keepdims=True)
        closer = tj < best_t
        best_prim = jnp.where(closer, n_tris + j, best_prim)
        best_t = jnp.where(closer, tj, best_t)
        best_u = jnp.where(closer, 0.0, best_u)
        best_v = jnp.where(closer, 0.0, best_v)

    out_ref[:] = jnp.concatenate(
        [best_t, best_u, best_v, best_prim.astype(jnp.float32)], 1)


@functools.partial(jax.jit, static_argnames=("kt", "ks", "n_tris", "n_spheres",
                                             "interpret", "precision"))
def pallas_closest_hit_packed(rfeat, dd, tmm, feat, *, kt, ks, n_tris,
                              n_spheres, interpret=False, precision="highest"):
    """Run the fused cast. rfeat [N, 12], dd [N, 1] (|d|^2), tmm [N, 2]
    (t_min, t_max), feat [12, C]. Returns packed [N, 4] (t, u, v, prim)."""
    n = rfeat.shape[0]
    c = feat.shape[1]
    # Ray tile: keep [TR, C] f32 intermediates within a VMEM budget.
    budget_elems = (3 * 1024 * 1024) // 4
    tr = max(8, min(1024, budget_elems // max(c, 1) // 8 * 8))
    n_pad = -(-n // tr) * tr
    if n_pad != n:
        pad = n_pad - n
        rfeat = jnp.concatenate([rfeat, jnp.zeros((pad, 12), rfeat.dtype)], 0)
        dd = jnp.concatenate([dd, jnp.ones((pad, 1), dd.dtype)], 0)
        tmm = jnp.concatenate([tmm, jnp.zeros((pad, 2), tmm.dtype)], 0)

    prec = {"highest": jax.lax.Precision.HIGHEST, "split3": "split3",
            "default": jax.lax.Precision.DEFAULT}[precision]
    kern = functools.partial(_intersect_kernel, kt=kt, ks=ks, n_tris=n_tris,
                             n_spheres=n_spheres, precision=prec)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, 12), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
    )(rfeat, dd, tmm, feat)
    return out[:n]


def pallas_closest_hit(ms, o, d, t_min, t_max, interpret=False,
                       precision="highest"):
    """Drop-in for intersect_mxu.mxu_closest_hit (minus the onehot return).

    ms: intersect_mxu.MxuScene. Returns (t, prim, u, v).
    """
    from ..render.intersect_mxu import _ray_features

    oc = o - ms.center
    rfeat = _ray_features(oc, d)
    dd = jnp.sum(d * d, -1, keepdims=True)
    tmm = jnp.stack([t_min, t_max], -1)
    out = pallas_closest_hit_packed(
        rfeat, dd, tmm, ms.feat, kt=ms.kt, ks=ms.ks, n_tris=ms.n_tris,
        n_spheres=ms.n_spheres, interpret=interpret, precision=precision)
    t = out[:, 0]
    u = out[:, 1]
    v = out[:, 2]
    prim = out[:, 3].astype(jnp.int32)
    hit = prim >= 0
    return jnp.where(hit, t, BIG), prim, u, v
