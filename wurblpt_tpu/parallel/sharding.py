"""Multi-chip / multi-host rendering: rays sharded over a device mesh.

Replaces the reference's MPI master/worker block scheduler (``libwurblpt/
mpi.hpp:36-289``) with the idiomatic JAX recipe (SURVEY.md section 2.2): one
global `Mesh` with a "rays" axis, the pixel/sample batch sharded across it, the
scene pytree replicated in HBM on every chip, and XLA inserting the collectives
(gradient psum, framebuffer gather) from sharding annotations — no hand-written
transport. Reproducibility across chip counts is free because the RNG is
counter-based per (pixel, sample): a pixel's radiance does not depend on which
chip computed it (unlike the reference's sequential per-pixel PRNG streams,
which are order-dependent but pinned per pixel — both designs give
chip-count-invariant images; ours also gives order invariance).

Dynamic load balancing: the reference pulls 4096-pixel blocks from a queue
(mpi.hpp:166-178). Here every chip gets an equal contiguous slice of the
(pixel x sample) ray space per pass; variance in path depth is averaged out
because each chip holds tens of thousands of lanes that retire independently
inside the masked wavefront loop. Round-3 profiling sharpened the rationale:
on TPU the per-iteration cost of the wavefront body is LANE-COUNT
proportional (lockstep masked work + per-row gather descriptors), not
live-path proportional — two chips holding equal lane counts take the same
wall time per iteration regardless of which chip's paths die first, and
iteration counts equalize through persistent-lane regeneration. The load
imbalance the reference's block queue exists to fix (a thread stuck on a
slow pixel) has no analog; what WOULD need rebalancing is unequal lane
counts, which the static equal split rules out by construction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.bsdf import SceneStatic
from ..render.camera import CameraConfig, CameraParams, SurroundMode
from ..render.integrator import RenderParams, render_frame


def make_ray_mesh(devices=None, axis: str = "rays") -> Mesh:
    """1-D device mesh over all (local or global) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def render_frame_sharded(
    scene,
    static: SceneStatic,
    cam: CameraParams,
    cam_cfg: CameraConfig,
    sensor,
    width: int,
    height: int,
    samples_sqrt: int,
    mesh: Optional[Mesh] = None,
    t0: float = 0.0,
    t1: float = 0.0,
    params: RenderParams = RenderParams(),
    samples_per_pass: int = 1,
):
    """Render with pixels sharded over the mesh's "rays" axis.

    The scene is replicated; the framebuffer is produced row-sharded and
    gathered implicitly on host fetch. Heights not divisible by the mesh size
    are padded internally (the extra rows render real pixels below the frame
    and are sliced off) — the analog of the reference's final partial MPI
    block (mpi.hpp:226-232).
    """
    if mesh is None:
        mesh = make_ray_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    # Pinhole mono ray gen is height-independent (extra rows = pixels below
    # the frame, bit-identical prefix); surround/stereo map rows through the
    # frame height so padding would change every ray.
    can_pad = cam_cfg.surround == SurroundMode.OFF and not cam_cfg.stereo
    if can_pad:
        pad_height = -(-height // n_dev) * n_dev
    else:
        # Surround/stereo mappings depend on the frame height; padding would
        # change every ray. Require divisibility there.
        assert height % n_dev == 0, (
            f"height {height} not divisible by {n_dev} devices "
            "(surround/stereo frames cannot be row-padded)"
        )
        pad_height = height

    rep = NamedSharding(mesh, P())

    def run(scene_in, cam_in):
        img = render_frame(
            scene_in, static, cam_in, cam_cfg, sensor, width, pad_height,
            samples_sqrt, t0, t1, params, samples_per_pass,
        )
        # Ask GSPMD to shard the framebuffer rows over the ray axis; everything
        # upstream (the per-pixel wavefront) is then row-sharded too.
        return jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P(axis, None, None))
        )

    fn = jax.jit(run, in_shardings=(rep, rep), out_shardings=NamedSharding(mesh, P(axis, None, None)))
    img = fn(scene, cam)
    return img[:height] if pad_height != height else img


def render_frame_wavefront_sharded(
    scene,
    static: SceneStatic,
    cam: CameraParams,
    cam_cfg: CameraConfig,
    sensor,
    width: int,
    height: int,
    samples_sqrt: int,
    mesh: Optional[Mesh] = None,
    t0: float = 0.0,
    t1: float = 0.0,
    params: RenderParams = RenderParams(),
    max_lanes: int = 131072,
):
    """The PRODUCTION inference path on a mesh: the persistent-lane wavefront
    with its framebuffer rows sharded over the "rays" axis (scene replicated,
    lanes row-partitioned by GSPMD from the output constraint).

    Same height-padding contract as `render_frame_sharded`; bitwise equality
    with the single-device wavefront is guaranteed by the counter-based RNG
    (verified in tests/test_sharding.py).
    """
    from ..render.integrator import render_frame_wavefront

    if mesh is None:
        mesh = make_ray_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    can_pad = cam_cfg.surround == SurroundMode.OFF and not cam_cfg.stereo
    if can_pad:
        pad_height = -(-height // n_dev) * n_dev
    else:
        assert height % n_dev == 0, (
            f"height {height} not divisible by {n_dev} devices "
            "(surround/stereo frames cannot be row-padded)"
        )
        pad_height = height

    rep = NamedSharding(mesh, P())
    out_sh = NamedSharding(mesh, P(axis, None, None))

    def run(scene_in, cam_in):
        img = render_frame_wavefront(
            scene_in, static, cam_in, cam_cfg, sensor, width, pad_height,
            samples_sqrt, t0, t1, params, max_lanes=max_lanes,
        )
        return jax.lax.with_sharding_constraint(img, out_sh)

    fn = jax.jit(run, in_shardings=(rep, rep), out_shardings=out_sh)
    img = fn(scene, cam)
    return img[:height] if pad_height != height else img


def training_step(
    scene,
    static: SceneStatic,
    cam: CameraParams,
    cam_cfg: CameraConfig,
    sensor,
    width: int,
    height: int,
    samples_sqrt: int,
    target,
    params0=None,
    apply_params=None,
    apply_cam=None,
    optimizer=None,
    mesh: Optional[Mesh] = None,
    params: RenderParams = RenderParams(),
    sample_start=0,
):
    """One step of THE production inverse-rendering optimizer on a mesh.

    This is `inverse.make_train_step` — the same optax-driven unit
    `inverse.fit` iterates single-device — compiled with the framebuffer (and
    with it the whole differentiable wavefront) row-sharded over the mesh's
    ray axis; scene/params replicated; GSPMD all-reduces the parameter
    gradients across ray shards (the psum of SURVEY.md section 2.2 "result
    reduction"). The multi-chip dryrun compiles exactly this step.

    params0/apply_params default to fitting the material color tables
    (albedo + emissive), the most common recovery target; pass any pytree +
    patcher for arbitrary scene/texture/camera fitting, exactly as with
    `inverse.fit`.

    Returns (loss, fitted_params, opt_state).
    """
    from ..inverse import make_train_step

    if mesh is None:
        mesh = make_ray_mesh()
    if params0 is None:
        params0 = {"albedo": scene.materials.albedo,
                   "emissive": scene.materials.emissive}

        def apply_params(s, p):  # noqa: F811 - default patcher pairs params0
            return s._replace(materials=s.materials._replace(
                albedo=p["albedo"], emissive=p["emissive"]))
    assert apply_params is not None, "params0 without apply_params"

    step_fn, optimizer = make_train_step(
        scene, apply_params, target,
        cam=cam, cam_cfg=cam_cfg, sensor=sensor, width=width, height=height,
        samples_sqrt=samples_sqrt, render_params=params, optimizer=optimizer,
        apply_cam=apply_cam, mesh=mesh, static=static,
    )
    opt_state = optimizer.init(params0)
    new_params, opt_state, loss, _img = step_fn(
        params0, opt_state, jnp.int32(sample_start))
    return loss, new_params, opt_state
