"""Wavefront BVH traversal: stackless threaded walk over the whole ray batch.

The reference traverses its flattened SAH tree with an explicit per-ray
128-deep stack (``libwurblpt/bvh.hpp:277-311``). A per-ray stack is hostile to
SIMD wavefronts, so here the tree is *threaded* at build time
(:mod:`wurblpt_tpu.accel.build`): every step is

    advance  = node + 1            on AABB hit at an inner node
    advance  = miss_next[node]     on AABB miss, or after a leaf's prims

and the whole batch walks in lockstep inside one ``lax.while_loop``; lanes that
finished idle on node -1 (remapped to node 0 gathers, results masked). Leaves
are a static LEAF_SIZE-wide primitive tile so each step has a fixed shape —
divergence across rays costs masked work, not recompilation.

Unlike the reference's stack traversal there is no near-child-first ordering
(the thread order is fixed at build time); the SAH layout plus the shrinking
`best_t` cull keeps visited-node counts close, and every visit is pure VPU
work (gather + slab test + 4 triangle tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import safe_sqrt

from ..scene.ir import SceneArrays

BIG = jnp.float32(3.0e37)


def _slab_test(o, inv_d, bmin, bmax, t_min, t_max):
    """Majercik slab test (``aabb.hpp:70-86`` semantics), batched [N]."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tlo, axis=-1), t_min)
    far = jnp.minimum(jnp.min(thi, axis=-1), t_max)
    return near <= far


def _leaf_intersect(scene: SceneArrays, o, d, t_min, pids, best, obj_rays=None):
    """Intersect each ray with its LEAF_SIZE gathered prims; fold into best.

    pids: [N, K] global prim ids (-1 = padding). best: (t, prim, u, v).
    obj_rays: optional per-animation object-space rays (o_a, d_a) [N,A,3];
    animated prims gather their lane's ray (hit t is affine-invariant).
    """
    bt, bp, bu, bv = best
    n_tri = scene.n_tris
    valid_pid = pids >= 0
    pid_safe = jnp.maximum(pids, 0)

    ox = o[:, None, :]
    dx = d[:, None, :]
    if obj_rays is not None:
        # Per-lane anim id: tris and spheres each carry one.
        if n_tri > 0:
            aid_t = scene.tris.anim[jnp.clip(pid_safe, 0, n_tri - 1)]
        else:
            aid_t = jnp.zeros(pids.shape, jnp.int32)
        if scene.n_spheres > 0:
            aid_s = scene.spheres.anim[
                jnp.clip(pid_safe - n_tri, 0, scene.n_spheres - 1)
            ]
        else:
            aid_s = jnp.zeros(pids.shape, jnp.int32)
        aid = jnp.where(pids < n_tri, aid_t, aid_s)
        o_a, d_a = obj_rays
        ox = jnp.take_along_axis(o_a, aid[..., None], axis=1)
        dx = jnp.take_along_axis(d_a, aid[..., None], axis=1)

    if n_tri > 0:
        ti = jnp.clip(pid_safe, 0, n_tri - 1)
        T = scene.tris
        p0 = T.p0[ti]
        e1 = T.e1[ti]
        e2 = T.e2[ti]
        pvec = jnp.cross(dx, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        tvec = ox - p0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(dx * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        tri_ok = (
            valid_pid
            & (pids < n_tri)
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min[:, None])
        )
        t_tri = jnp.where(tri_ok, t, BIG)
    else:
        t_tri = jnp.full(pids.shape, BIG)
        u = jnp.zeros(pids.shape)
        v = jnp.zeros(pids.shape)

    if scene.n_spheres > 0:
        si = jnp.clip(pid_safe - n_tri, 0, scene.n_spheres - 1)
        S = scene.spheres
        center = S.center[si]
        radius = S.radius[si]
        oc = ox - center
        a = jnp.sum(dx * dx, axis=-1)
        half_b = jnp.sum(oc * dx, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = half_b * half_b - a * c
        sq = safe_sqrt(disc)
        q = -(half_b + jnp.sign(half_b) * sq)
        s0 = q / jnp.maximum(a, 1e-20)
        s1 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
        slo = jnp.minimum(s0, s1)
        shi = jnp.maximum(s0, s1)
        ts = jnp.where(slo > t_min[:, None], slo, shi)
        sph_ok = (
            valid_pid & (pids >= n_tri) & (disc > 0.0) & (ts > t_min[:, None])
        )
        t_sph = jnp.where(sph_ok, ts, BIG)
    else:
        t_sph = jnp.full(pids.shape, BIG)

    t_all = jnp.minimum(t_tri, t_sph)
    t_all = jnp.where(t_all < bt[:, None], t_all, BIG)
    k = jnp.argmin(t_all, axis=-1)
    rows = jnp.arange(pids.shape[0])
    tk = t_all[rows, k]
    closer = tk < bt
    is_tri_win = pids[rows, k] < n_tri
    return (
        jnp.where(closer, tk, bt),
        jnp.where(closer, pids[rows, k], bp),
        jnp.where(closer, jnp.where(is_tri_win, u[rows, k], 0.0), bu),
        jnp.where(closer, jnp.where(is_tri_win, v[rows, k], 0.0), bv),
    )


def bvh_closest_hit(scene: SceneArrays, o, d, t_min, t_max, obj_rays=None):
    """Closest hit via the threaded BVH. Returns (t, prim, u, v); prim=-1 miss.

    Node AABBs are world-space (swept over the render interval for animated
    prims at build time); leaves test in object space via `obj_rays`.
    """
    bvh = scene.bvh
    n = o.shape[0]
    leaf_k = _leaf_width(bvh)

    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / jnp.where(d == 0.0, 1.0, d), BIG)

    init = (
        jnp.zeros((n,), jnp.int32),          # current node
        jnp.full((n,), BIG),                 # best t
        jnp.full((n,), -1, jnp.int32),       # best prim
        jnp.zeros((n,)),                     # best u
        jnp.zeros((n,)),                     # best v
    )

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        node, bt, bp, bu, bv = state
        live = node >= 0
        ns = jnp.maximum(node, 0)
        bmin = bvh.node_min[ns]
        bmax = bvh.node_max[ns]
        pstart = bvh.prim_start[ns]
        pcount = bvh.prim_count[ns]
        miss = bvh.miss_next[ns]

        box_hit = live & _slab_test(o, inv_d, bmin, bmax, t_min, jnp.minimum(t_max, bt))
        is_leaf = pcount > 0
        do_leaf = box_hit & is_leaf

        # Static-width leaf tile: gather LEAF_SIZE prim slots, mask padding and
        # lanes not standing on a hit leaf.
        offs = jnp.arange(leaf_k, dtype=jnp.int32)[None, :]
        slot = jnp.maximum(pstart, 0)[:, None] + offs
        slot = jnp.clip(slot, 0, bvh.prim_order.shape[0] - 1)
        pids = jnp.where(do_leaf[:, None], bvh.prim_order[slot], -1)
        bt, bp, bu, bv = _leaf_intersect(
            scene, o, d, t_min, pids, (bt, bp, bu, bv), obj_rays=obj_rays
        )

        nxt = jnp.where(box_hit & ~is_leaf, ns + 1, miss)
        node = jnp.where(live, nxt, -1)
        return node, bt, bp, bu, bv

    node, bt, bp, bu, bv = jax.lax.while_loop(cond, body, init)
    hit = bp >= 0
    return jnp.where(hit, bt, BIG), bp, bu, bv


def _leaf_width(bvh) -> int:
    """Leaf tile width; every leaf occupies exactly this many prim_order slots."""
    # prim_order length is (num_leaves * leaf_size); leaf_size is the builder's
    # LEAF_SIZE constant. Stored implicitly: recover from the smallest leaf
    # stride. All builders in accel.build use LEAF_SIZE.
    from .build import LEAF_SIZE

    return LEAF_SIZE
