"""Inverse rendering: optimize scene/camera parameters against image targets.

The reference has no autodiff at all; this module is the TPU framework's
flagship differentiable-rendering entry point. The design is parameter-pytree
-based and optimizer-agnostic:

* `render_loss(...)` builds a differentiable scalar loss for any render
  configuration (the bounce loop runs in fixed-trip rematerialized mode,
  integrator.RenderParams(differentiable=True)).
* `fit(...)` runs an optax optimizer over an arbitrary params pytree; the
  caller says how params patch into the scene via `apply_params` — e.g. a
  texture image, a material roughness column, envmap texels, or the camera
  pose. Gradients flow through the attached-pdf estimator validated by
  tests/test_gradients.py.

Typical use (examples/inverse_rendering.py):

    params0 = {"albedo_img": jnp.full((16, 16, 4), 0.5)}
    def apply_params(scene, p):
        img_data = scene.textures.img_data.at[tex_id].set(p["albedo_img"])
        return scene._replace(textures=scene.textures._replace(img_data=img_data))
    result = fit(scene, params0, apply_params, target, render_kwargs, steps=60)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .render.bsdf import SceneStatic
from .render.camera import CameraConfig, CameraParams
from .render.integrator import RenderParams, render_frame
from .render.sensor import SensorRGB


@dataclass
class FitResult:
    params: Any
    losses: list
    final_image: Any


def fit(
    scene,
    params0,
    apply_params: Callable[[Any, Any], Any],
    target,
    *,
    cam: CameraParams,
    cam_cfg: CameraConfig = CameraConfig(),
    sensor=SensorRGB(),
    width: int,
    height: int,
    samples_sqrt: int = 2,
    render_params: RenderParams = RenderParams(max_path_components=4),
    optimizer=None,
    steps: int = 50,
    loss_fn: Optional[Callable] = None,
    apply_cam: Optional[Callable[[CameraParams, Any], CameraParams]] = None,
    post_step: Optional[Callable[[Any], Any]] = None,
    sample_offset_per_step: bool = True,
    verbose: bool = False,
) -> FitResult:
    """Optimize `params0` so the rendered image matches `target`.

    apply_params(scene, params) -> scene patched with the current params.
    apply_cam(cam, params) -> camera patched (optional, for pose fitting).
    post_step(params) -> params, applied after each update (e.g. clipping to
    valid ranges). `sample_offset_per_step` re-randomizes the stratified
    sample id each step (stochastic gradient over the sample space) by
    rotating which sample of an (8x8) grid is drawn — cheap decorrelation.

    Returns FitResult(params, losses, final_image).
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(2e-2)
    if loss_fn is None:
        loss_fn = lambda img, tgt: jnp.mean((img - tgt) ** 2)

    static = SceneStatic.from_scene(scene)

    import dataclasses

    diff_params = dataclasses.replace(render_params, differentiable=True)
    spp = samples_sqrt * samples_sqrt
    # Stratification grid: 8x8 = 64 sample slots; each step draws a
    # non-overlapping window of `spp` of them (counter-based RNG => each
    # window is an independent, reproducible sample set).
    n_windows = max(64 // spp, 1)

    def objective(params, sample_start):
        s = apply_params(scene, params)
        c = apply_cam(cam, params) if apply_cam is not None else cam
        from .render.integrator import accumulate_passes

        acc = accumulate_passes(
            s, static, c, cam_cfg, sensor, width, height, 8,
            0.0, 0.0, diff_params, 1,
            jnp.zeros((width * height, sensor.n_acc)),
            0, spp, sample_offset=sample_start,
        )
        img = sensor.finish(acc, 1.0 / spp).reshape(height, width, sensor.n_acc)
        return loss_fn(img, target), img

    grad_fn = jax.jit(jax.value_and_grad(objective, has_aux=True))
    opt_state = optimizer.init(params0)
    params = params0
    losses = []
    img = None

    @jax.jit
    def update(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for step in range(steps):
        win = (step % n_windows) if sample_offset_per_step else 0
        salt = jnp.int32(win * spp)
        (loss, img), grads = grad_fn(params, salt)
        params, opt_state = update(params, opt_state, grads)
        if post_step is not None:
            params = post_step(params)
        losses.append(float(loss))
        if verbose and (step % 10 == 0 or step == steps - 1):
            print(f"step {step:4d}  loss {float(loss):.6f}")
    return FitResult(params=params, losses=losses, final_image=img)
