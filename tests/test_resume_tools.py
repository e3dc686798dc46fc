"""Checkpoint/resume bit-exactness + surround conversion tools."""

import numpy as np
import jax.numpy as jnp

from wurblpt_tpu import CameraConfig, RenderParams, SceneStatic, SensorRGB, make_camera
from wurblpt_tpu.render import checkpoint as ckpt
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.utils import scenes, surround


def _setup(w=16, h=16):
    scene = scenes.cornell_box().build()
    static = SceneStatic.from_scene(scene)
    pose, vfov = scenes.cornell_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=w, height=h)
    return scene, static, cam


def test_checkpoint_resume_bit_exact(tmp_path):
    """A render split into chunks (with a save/load round trip in the middle)
    must equal the uninterrupted render bit for bit."""
    w = h = 16
    ssqrt = 2
    scene, static, cam = _setup(w, h)
    sensor = SensorRGB()
    params = RenderParams(max_path_components=4)

    ref = render_frame(scene, static, cam, CameraConfig(), sensor, w, h, ssqrt,
                       params=params)

    st = ckpt.start(sensor.n_acc, w, h, ssqrt, params=params)
    st = ckpt.step(st, scene, static, cam, CameraConfig(), sensor, w, h, ssqrt,
                   params=params, n_pass=1)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, st)
    st2 = ckpt.load(path)
    assert st2.passes_done == 1 and not st2.complete
    st2 = ckpt.step(st2, scene, static, cam, CameraConfig(), sensor, w, h, ssqrt,
                    params=params)
    assert st2.complete
    img = ckpt.finish(st2, sensor, w, h, ssqrt)

    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))


def test_checkpoint_rejects_config_mismatch():
    sensor = SensorRGB()
    st = ckpt.start(sensor.n_acc, 8, 8, 2)
    scene, static, cam = _setup(8, 8)
    try:
        ckpt.step(st, scene, static, cam, CameraConfig(), sensor, 8, 8, 4)
    except ValueError:
        return
    raise AssertionError("config mismatch not detected")


def test_surround_crops():
    img = np.arange(8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3)
    c = surround.surround_360_to_180(img)
    assert c.shape == (8, 8, 3)
    np.testing.assert_array_equal(c, img[:, 4:12])

    mono = surround.stereo_to_mono(img)
    assert mono.shape == (4, 16, 3)
    np.testing.assert_array_equal(mono, img[:4])

    packed = surround.stereo_pack(mono, img[4:])
    np.testing.assert_array_equal(packed, img)


def test_conventional_from_360_constant():
    """A constant-color 360 frame re-renders to the same constant color
    (the envmap-as-scene path of wurblpt-360-to-conventional.cpp:64-87)."""
    img = np.full((8, 16, 3), 0.25, np.float32)
    out = surround.conventional_from_360(img, 8, 6, vfov_deg=50.0)
    assert out.shape == (6, 8, 3)
    np.testing.assert_allclose(out, 0.25, atol=1e-5)
