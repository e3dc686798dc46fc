"""Wavefront BVH traversal: stackless threaded walk over the whole ray batch.

The reference traverses its flattened SAH tree with an explicit per-ray
128-deep stack (``libwurblpt/bvh.hpp:277-311``). A per-ray stack is hostile to
SIMD wavefronts, so here the tree is *threaded* at build time
(:mod:`wurblpt_tpu.accel.build`): every step is

    advance  = node + 1            on AABB hit at an inner node
    advance  = miss_next[node]     on AABB miss, or after a leaf's prims

and the whole batch walks in lockstep inside one ``lax.while_loop``; lanes that
finished idle on node -1 (remapped to node 0 gathers, results masked). Leaves
are a static K-wide primitive tile (K = ``leaf_prims.shape[1]``, a build-time
knob) so each step has a fixed shape — divergence across rays costs masked
work, not recompilation.

TPU cost model (measured round 3): the walk is gather-bound, so each step does
exactly TWO row gathers (packed ``node_f``/``node_i``) and the leaf width is
WIDE for big scenes (64 prims/leaf) — tile intersection is vectorized VPU work
that cuts lockstep step counts by an order of magnitude vs 4-wide leaves.

Unlike the reference's stack traversal there is no near-child-first ordering
(the thread order is fixed at build time); the SAH layout plus the shrinking
`best_t` cull keeps visited-node counts close, and every visit is pure VPU
work.

Triangle tests inside leaves are WATERTIGHT (intersect.watertight_tri, Woop
semantics per ``hitable_triangle.hpp:189-274``) when the scene carries
absolute vertices; the Moller-Trumbore fallback only remains for raw-array
scenes built without them.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core.vecmath import safe_sqrt

from ..scene.ir import SceneArrays

# Host scalar, NOT jnp: a module-level device array becomes a hoisted
# const_arg in every program that closes over it (jax 0.9.0 drops those
# on cross-program re-dispatch; see tests/conftest.py).
BIG = np.float32(3.0e37)


def _slab_test(o, inv_d, bmin, bmax, t_min, t_max):
    """Majercik slab test (``aabb.hpp:70-86`` semantics), batched [N]."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tlo, axis=-1), t_min)
    far = jnp.minimum(jnp.min(thi, axis=-1), t_max)
    return near <= far


def _leaf_rays(scene, o, d, pids, obj_rays):
    """Per-(lane, slot) rays: world by default, per-animation object space
    when obj_rays is given (hit t is affine-invariant)."""
    ox = o[:, None, :]
    dx = d[:, None, :]
    if obj_rays is None:
        return ox, dx
    n_tri = scene.n_tris
    pid_safe = jnp.maximum(pids, 0)
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
    return ox, dx


def _leaf_tri_test(scene, ox, dx, pids, t_min, t_max):
    """Triangle tile test for gathered leaf prims. Returns (t, u, v, ok)."""
    from ..render.intersect import watertight_tri

    n_tri = scene.n_tris
    valid_pid = (pids >= 0) & (pids < n_tri)
    ti = jnp.clip(jnp.maximum(pids, 0), 0, n_tri - 1)
    T = scene.tris
    if T.v1 is not None:
        t, u, v, ok = watertight_tri(
            ox, dx, T.p0[ti], T.v1[ti], T.v2[ti],
            t_min[:, None], t_max[:, None],
        )
        ok = ok & valid_pid
        return jnp.where(ok, t, BIG), u, v, ok
    p0, e1, e2 = T.p0[ti], T.e1[ti], T.e2[ti]
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
    ok = (
        valid_pid
        & (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[:, None]) & (t < t_max[:, None])
    )
    return jnp.where(ok, t, BIG), u, v, ok


def _leaf_sphere_test(scene, ox, dx, pids, t_min, t_max):
    n_tri = scene.n_tris
    valid_pid = pids >= n_tri
    si = jnp.clip(jnp.maximum(pids, 0) - n_tri, 0, scene.n_spheres - 1)
    S = scene.spheres
    oc = ox - S.center[si]
    a = jnp.sum(dx * dx, axis=-1)
    half_b = jnp.sum(oc * dx, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - S.radius[si] * S.radius[si]
    disc = half_b * half_b - a * c
    sq = safe_sqrt(disc)
    q = -(half_b + jnp.sign(half_b) * sq)
    s0 = q / jnp.maximum(a, 1e-20)
    s1 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
    slo = jnp.minimum(s0, s1)
    shi = jnp.maximum(s0, s1)
    ts = jnp.where(slo > t_min[:, None], slo, shi)
    ok = (
        valid_pid & (disc > 0.0)
        & (ts > t_min[:, None]) & (ts < t_max[:, None])
    )
    return jnp.where(ok, ts, BIG), ok


def _packed_leaf_rays(scene, bvh, o, d, leaf_row_safe, pids, obj_rays):
    """Rays per (lane, slot) for the packed leaf path: world rays broadcast,
    or per-slot object-space rays via the packed leaf_anim ids."""
    if obj_rays is None:
        return o[:, None, :], d[:, None, :]
    aid = bvh.leaf_anim[leaf_row_safe]
    aid = jnp.where(pids >= 0, aid, 0)
    o_a, d_a = obj_rays
    ox = jnp.take_along_axis(o_a, aid[..., None], axis=1)
    dx = jnp.take_along_axis(d_a, aid[..., None], axis=1)
    return ox, dx


def _packed_leaf_tests(scene, bvh, o, d, t_min, t_max, leaf_row, on_leaf,
                       obj_rays):
    """Intersect each lane against its leaf's PACKED geometry row.

    One [N]-row gather of leaf_geom [L, K, 9] replaces K per-prim gathers
    (measured ~10x on the leaf phase at 100k prims). Returns
    (pids, t [N,K], u, v, ok)."""
    from ..render.intersect import watertight_tri

    leaf_row_safe = jnp.maximum(leaf_row, 0)
    pids = jnp.where(on_leaf[:, None], bvh.leaf_prims[leaf_row_safe], -1)
    geom = bvh.leaf_geom[leaf_row_safe]            # [N, K, 9] one gather
    ox, dx = _packed_leaf_rays(scene, bvh, o, d, leaf_row_safe, pids, obj_rays)

    n_tri = scene.n_tris
    is_tri = (pids >= 0) & (pids < n_tri)
    is_sph = pids >= n_tri
    tmaxk = t_max[:, None]

    t_all = jnp.full(pids.shape, BIG)
    u = jnp.zeros(pids.shape)
    v = jnp.zeros(pids.shape)
    ok = jnp.zeros(pids.shape, bool)
    if n_tri > 0:
        tt, ut, vt, okt = watertight_tri(
            ox, dx, geom[..., 0:3], geom[..., 3:6], geom[..., 6:9],
            t_min[:, None], tmaxk,
        )
        okt = okt & is_tri
        t_all = jnp.where(okt, tt, t_all)
        u = jnp.where(okt, ut, u)
        v = jnp.where(okt, vt, v)
        ok = ok | okt
    if scene.n_spheres > 0:
        oc = ox - geom[..., 0:3]
        radius = geom[..., 3]
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
        oks = is_sph & (disc > 0.0) & (ts > t_min[:, None]) & (ts < tmaxk)
        t_all = jnp.where(oks, ts, t_all)
        ok = ok | oks
    return pids, t_all, u, v, ok


def _leaf_intersect(scene: SceneArrays, o, d, t_min, pids, best, obj_rays=None):
    """Intersect each ray with its K gathered leaf prims; fold into best.

    pids: [N, K] global prim ids (-1 = padding). best: (t, prim, u, v).
    (Per-prim-gather fallback for BVHs built without packed leaf geometry.)
    """
    bt, bp, bu, bv = best
    ox, dx = _leaf_rays(scene, o, d, pids, obj_rays)

    if scene.n_tris > 0:
        t_tri, u, v, _ = _leaf_tri_test(scene, ox, dx, pids, t_min, bt)
    else:
        t_tri = jnp.full(pids.shape, BIG)
        u = jnp.zeros(pids.shape)
        v = jnp.zeros(pids.shape)

    if scene.n_spheres > 0:
        t_sph, _ = _leaf_sphere_test(scene, ox, dx, pids, t_min, bt)
    else:
        t_sph = jnp.full(pids.shape, BIG)

    t_all = jnp.minimum(t_tri, t_sph)
    t_all = jnp.where(t_all < bt[:, None], t_all, BIG)
    k = jnp.argmin(t_all, axis=-1)
    rows = jnp.arange(pids.shape[0])
    tk = t_all[rows, k]
    closer = tk < bt
    is_tri_win = pids[rows, k] < scene.n_tris
    return (
        jnp.where(closer, tk, bt),
        jnp.where(closer, pids[rows, k], bp),
        jnp.where(closer, jnp.where(is_tri_win, u[rows, k], 0.0), bu),
        jnp.where(closer, jnp.where(is_tri_win, v[rows, k], 0.0), bv),
    )


def _octant_base(bvh, d):
    """Per-ray base row into the flattened per-octant link table [8N, 3]:
    octant = sign bits of the direction, row = octant * N + node."""
    n_nodes = bvh.node_f.shape[0]
    oct_ = ((d[:, 0] < 0).astype(jnp.int32)
            | ((d[:, 1] < 0).astype(jnp.int32) << 1)
            | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    return oct_ * n_nodes


def _walk_to_leaf(bvh, o, inv_d, t_min, node, tmax_eff, oct_base=None):
    """Advance every lane to its NEXT hit leaf (or -1 done).

    Inner-node stepping is CHEAP (two small-table row gathers + a slab test);
    leaf-tile intersection is EXPENSIVE (wide gathers from the primitive
    arrays). Separating them means leaf work happens once per leaf VISIT, not
    once per traversal STEP — the gather volume drops by the inner/leaf step
    ratio (measured 35 s -> sub-second per cast at 100k prims, 76800 lanes).

    Links come from the per-ray-octant threading (build._octant_links), so
    every walk is near-child-first and tmax_eff (the shrinking best_t) prunes
    the far side. Returns the node id of a HIT leaf per lane, or -1 done.
    """
    def cond(state):
        node, settled = state
        return jnp.any(~settled)

    def body(state):
        node, settled = state
        live = node >= 0
        ns = jnp.maximum(node, 0)
        nf = bvh.node_f[ns]
        if oct_base is not None:
            ln = bvh.node_oct[oct_base + ns]
            leaf_row, hit_link, miss_link = ln[:, 0], ln[:, 1], ln[:, 2]
        else:
            # plain pre-order threading (any-hit: no best_t to prune with, and
            # the smaller table gathers faster — measured 193 vs 318 ms/cast)
            ni = bvh.node_i[ns]
            leaf_row, miss_link = ni[:, 0], ni[:, 1]
            hit_link = ns + 1
        box_hit = live & _slab_test(
            o, inv_d, nf[:, 0:3], nf[:, 3:6], t_min, tmax_eff
        )
        at_hit_leaf = box_hit & (leaf_row >= 0)
        nxt = jnp.where(box_hit & (leaf_row < 0), hit_link, miss_link)
        node = jnp.where(live & ~settled & ~at_hit_leaf, nxt, node)
        settled = settled | at_hit_leaf | (node < 0)
        return node, settled

    node, _ = jax.lax.while_loop(
        cond, body, (node, node < 0)
    )
    return node


def bvh_closest_hit(scene: SceneArrays, o, d, t_min, t_max, obj_rays=None):
    """Closest hit via the threaded BVH. Returns (t, prim, u, v); prim=-1 miss.

    Node AABBs are world-space (swept over the render interval for animated
    prims at build time); leaves test in object space via `obj_rays`.

    Two-phase lockstep: an inner while_loop walks all lanes to their next hit
    leaf using only the packed node tables; an outer while_loop then pays one
    wide primitive-tile gather per LEAF VISIT. TPU gathers, not FLOPs, are
    the cost model here.
    """
    bvh = scene.bvh
    n = o.shape[0]

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

    use_packed = bvh.leaf_geom is not None and (
        obj_rays is None or bvh.leaf_anim is not None)
    oct_base = _octant_base(bvh, d)

    def body(state):
        node, bt, bp, bu, bv = state
        node = _walk_to_leaf(bvh, o, inv_d, t_min, node,
                             jnp.minimum(t_max, bt), oct_base)
        on_leaf = node >= 0
        ns = jnp.maximum(node, 0)
        ni = bvh.node_oct[oct_base + ns]
        leaf_row = jnp.where(on_leaf, ni[:, 0], -1)
        if use_packed:
            pids, t_all, u, v, _ = _packed_leaf_tests(
                scene, bvh, o, d, t_min, bt, leaf_row, on_leaf, obj_rays)
            t_all = jnp.where(t_all < bt[:, None], t_all, BIG)
            k = jnp.argmin(t_all, axis=-1)
            rows = jnp.arange(pids.shape[0])
            tk = t_all[rows, k]
            closer = tk < bt
            is_tri_win = pids[rows, k] < scene.n_tris
            bt = jnp.where(closer, tk, bt)
            bp = jnp.where(closer, pids[rows, k], bp)
            bu = jnp.where(closer, jnp.where(is_tri_win, u[rows, k], 0.0), bu)
            bv = jnp.where(closer, jnp.where(is_tri_win, v[rows, k], 0.0), bv)
        else:
            pids = jnp.where(
                on_leaf[:, None], bvh.leaf_prims[jnp.maximum(leaf_row, 0)], -1
            )
            bt, bp, bu, bv = _leaf_intersect(
                scene, o, d, t_min, pids, (bt, bp, bu, bv), obj_rays=obj_rays
            )
        node = jnp.where(on_leaf, ni[:, 2], -1)  # resume at the leaf's miss link
        return node, bt, bp, bu, bv

    node, bt, bp, bu, bv = jax.lax.while_loop(cond, body, init)
    hit = bp >= 0
    return jnp.where(hit, bt, BIG), bp, bu, bv


def bvh_any_hit(scene: SceneArrays, o, d, t_min, t_max, obj_rays=None):
    """Occlusion walk: a lane retires the moment ANY hit lands in
    (t_min, t_max) — no best-t refinement, early exit per lane. Same
    two-phase walk-to-leaf structure as bvh_closest_hit (TPU gathers are the
    cost, so leaf tiles are paid per leaf VISIT, not per step)."""
    bvh = scene.bvh
    n = o.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / jnp.where(d == 0.0, 1.0, d), BIG)

    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))

    def cond(state):
        return jnp.any(state[0] >= 0)

    use_packed = bvh.leaf_geom is not None and (
        obj_rays is None or bvh.leaf_anim is not None)

    def body(state):
        node, occ = state
        node = _walk_to_leaf(bvh, o, inv_d, t_min, node, t_max)
        on_leaf = node >= 0
        ns = jnp.maximum(node, 0)
        ni = bvh.node_i[ns]
        leaf_row = jnp.where(on_leaf, ni[:, 0], -1)
        if use_packed:
            _, _, _, _, ok = _packed_leaf_tests(
                scene, bvh, o, d, t_min, t_max, leaf_row, on_leaf, obj_rays)
            hit_any = jnp.any(ok, axis=-1)
        else:
            pids = jnp.where(
                on_leaf[:, None], bvh.leaf_prims[jnp.maximum(leaf_row, 0)], -1
            )
            ox, dx = _leaf_rays(scene, o, d, pids, obj_rays)
            hit_any = jnp.zeros((n,), bool)
            if scene.n_tris > 0:
                _, _, _, ok = _leaf_tri_test(scene, ox, dx, pids, t_min, t_max)
                hit_any |= jnp.any(ok, axis=-1)
            if scene.n_spheres > 0:
                _, oks = _leaf_sphere_test(scene, ox, dx, pids, t_min, t_max)
                hit_any |= jnp.any(oks, axis=-1)
        occ = occ | hit_any
        node = jnp.where(on_leaf & ~occ, ni[:, 1], -1)
        return node, occ

    _, occ = jax.lax.while_loop(cond, body, init)
    return occ
