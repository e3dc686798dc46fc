"""Device-side keyframe animation evaluation.

Reference: ``Animation::at(t)`` + binary keyframe search with lerp+slerp
(``animation_keyframes.hpp:51-216``) and the per-render-time ``AnimationCache``
(``animation.hpp:52-125``). On TPU there is no cache: evaluation is a pure
vectorized gather + slerp over the padded keyframe tables, cheap enough to run
per ray time (motion blur gives every ray its own time anyway).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.transform import Transformation, quat_slerp
from .ir import AnimTable


def eval_animation(anims: AnimTable, aid, t) -> Transformation:
    """Evaluate animation `aid` [N] at time `t` [N] -> Transformation batch.

    Clamps outside the keyframe range (the reference clamps too). Row 0 is the
    static identity, so static prims evaluate to identity for free.
    """
    times = anims.times[aid]              # [N, K] (+inf padded)
    k = jnp.sum((times <= t[..., None]).astype(jnp.int32), axis=-1) - 1
    kmax = anims.nkeys[aid] - 1
    k0 = jnp.clip(k, 0, kmax)
    k1 = jnp.clip(k + 1, 0, kmax)
    t0 = jnp.take_along_axis(times, k0[..., None], axis=-1)[..., 0]
    t1 = jnp.take_along_axis(times, k1[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(t1 - t0, 1e-12)
    alpha = jnp.clip((t - t0) / denom, 0.0, 1.0)

    def g(table, idx):
        return jnp.take_along_axis(table[aid], idx[..., None, None], axis=-2)[..., 0, :]

    tr0, tr1 = g(anims.trans, k0), g(anims.trans, k1)
    ro0, ro1 = g(anims.rot, k0), g(anims.rot, k1)
    sc0, sc1 = g(anims.scale, k0), g(anims.scale, k1)
    a = alpha[..., None]
    return Transformation(
        translation=tr0 + (tr1 - tr0) * a,
        rotation=quat_slerp(ro0, ro1, alpha),
        scale=sc0 + (sc1 - sc0) * a,
    )
