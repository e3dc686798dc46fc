"""Intra-frame checkpoint/resume of sample accumulation.

The reference has no within-frame checkpointing — its effective resume unit is
one written image per frame (SURVEY.md section 5.4; sensor accumulators are
overwritten per mcpt call, ``sensor_rgb.hpp:82-87``). Because this framework's
RNG is counter-based on (pixel id, global sample id) rather than a sequential
per-pixel stream (``prng.hpp:47-101``), a render interrupted after any number
of sample passes can resume and produce a bit-identical image: the checkpoint
is just (raw accumulator, passes done, frame config hash).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .integrator import RenderParams, accumulate_passes


def _config_key(width, height, samples_sqrt, t0, t1, samples_per_pass, params) -> str:
    blob = json.dumps(
        [width, height, samples_sqrt, float(t0), float(t1), samples_per_pass,
         params.max_path_components, params.rr_threshold, params.rr_start,
         params.min_hit_distance, params.randomize_ray_over_pixel],
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class RenderCheckpoint:
    """Raw sensor accumulator plus progress bookkeeping for one frame."""

    acc: jnp.ndarray          # [n_pix, n_acc] raw (unfinished) accumulator
    passes_done: int
    n_pass_total: int
    config_key: str

    @property
    def complete(self) -> bool:
        return self.passes_done >= self.n_pass_total


def start(scene_sensor_n_acc: int, width: int, height: int, samples_sqrt: int,
          t0: float = 0.0, t1: float = 0.0, samples_per_pass: int = 1,
          params: RenderParams = RenderParams()) -> RenderCheckpoint:
    spp = samples_sqrt * samples_sqrt
    assert spp % samples_per_pass == 0
    return RenderCheckpoint(
        acc=jnp.zeros((width * height, scene_sensor_n_acc)),
        passes_done=0,
        n_pass_total=spp // samples_per_pass,
        config_key=_config_key(width, height, samples_sqrt, t0, t1,
                               samples_per_pass, params),
    )


def step(ckpt: RenderCheckpoint, scene, static, cam, cam_cfg, sensor,
         width: int, height: int, samples_sqrt: int,
         t0: float = 0.0, t1: float = 0.0, samples_per_pass: int = 1,
         params: RenderParams = RenderParams(),
         n_pass: Optional[int] = None) -> RenderCheckpoint:
    """Advance the render by up to `n_pass` sample passes (all remaining by
    default). Bit-identical to an uninterrupted render_frame."""
    key = _config_key(width, height, samples_sqrt, t0, t1, samples_per_pass, params)
    if key != ckpt.config_key:
        raise ValueError("checkpoint was created with a different render config")
    todo = ckpt.n_pass_total - ckpt.passes_done
    if n_pass is not None:
        todo = min(todo, n_pass)
    if todo <= 0:
        return ckpt
    acc = accumulate_passes(
        scene, static, cam, cam_cfg, sensor, width, height, samples_sqrt,
        t0, t1, params, samples_per_pass, ckpt.acc, ckpt.passes_done, todo,
    )
    return RenderCheckpoint(acc=acc, passes_done=ckpt.passes_done + todo,
                            n_pass_total=ckpt.n_pass_total,
                            config_key=ckpt.config_key)


def finish(ckpt: RenderCheckpoint, sensor, width: int, height: int,
           samples_sqrt: int, samples_per_pass: int = 1):
    """Finished image from the samples accumulated so far (partial renders are
    normalized by the samples actually taken)."""
    done_spp = max(ckpt.passes_done * samples_per_pass, 1)
    img = sensor.finish(ckpt.acc, 1.0 / done_spp)
    return img.reshape(height, width, -1)


def save(path: str, ckpt: RenderCheckpoint) -> None:
    np.savez(path, acc=np.asarray(ckpt.acc), passes_done=ckpt.passes_done,
             n_pass_total=ckpt.n_pass_total, config_key=ckpt.config_key)


def load(path: str) -> RenderCheckpoint:
    z = np.load(path, allow_pickle=False)
    return RenderCheckpoint(
        acc=jnp.asarray(z["acc"]),
        passes_done=int(z["passes_done"]),
        n_pass_total=int(z["n_pass_total"]),
        config_key=str(z["config_key"]),
    )
