"""Post-processing parity tests (libwurblpt/postproc.hpp:44-338): tone map,
rescale, despeckle, image-space distortion round trip, ToF coords."""

import numpy as np

import jax.numpy as jnp

from wurblpt_tpu import CameraConfig, make_camera
from wurblpt_tpu.render.camera import DistortionModel
from wurblpt_tpu.utils import postproc


def test_srgb_transfer_matches_standard():
    x = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(8, 8, 1)
    y = np.asarray(postproc.to_srgb(x))
    # standard sRGB encode (color.hpp:265-285)
    ref = np.where(x <= 0.0031308, 12.92 * x,
                   1.055 * np.power(x, 1 / 2.4) - 0.055)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_urq_tonemap_monotone_and_bounded():
    x = np.linspace(0.0, 4.0, 128, dtype=np.float32).reshape(8, 16, 1)
    y = np.asarray(postproc.uniform_rational_quantization(x))
    assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-6
    flat = y.reshape(-1)
    assert np.all(np.diff(flat) >= -1e-6)  # monotone in input


def test_rescale_preserves_mean():
    rng = np.random.default_rng(0)
    img = rng.random((16, 24, 3)).astype(np.float32)
    out = np.asarray(postproc.rescale(img, 8, 12))
    assert out.shape == (8, 12, 3)
    np.testing.assert_allclose(out.mean(), img.mean(), atol=0.02)


def test_despeckle_removes_firefly_keeps_smooth():
    img = np.full((9, 9, 3), 0.5, np.float32)
    img[4, 4] = 500.0  # firefly
    out = np.asarray(postproc.despeckle(jnp.asarray(img)))
    assert out[4, 4, 0] < 1.0, "firefly must be median-suppressed"
    # smooth pixels untouched (reference despeckle only rewrites outliers)
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(out[7, 2], 0.5, atol=1e-5)


def test_distort_undistort_image_roundtrip():
    rng = np.random.default_rng(1)
    # smooth image so bilinear resampling error stays small
    yy, xx = np.meshgrid(np.linspace(0, 1, 48), np.linspace(0, 1, 48),
                         indexing="ij")
    img = np.stack([np.sin(4 * xx) * 0.5 + 0.5,
                    np.cos(3 * yy) * 0.5 + 0.5,
                    xx * yy], -1).astype(np.float32)
    cam = make_camera(vfov_deg=50.0, width=48, height=48,
                      dist_k=(-0.08, 0.01, 0, 0, 0, 0), dist_p=(0.0, 0.0))
    cfg = CameraConfig(distortion=DistortionModel.OPENCV)
    dist = postproc.distort_image(jnp.asarray(img), cam, cfg)
    back = np.asarray(postproc.undistort_image(dist, cam, cfg))
    # compare away from the border (resampling pulls in edge pixels)
    c = slice(8, 40)
    err = np.abs(back[c, c] - img[c, c]).mean()
    assert err < 0.02, err


def test_tof_distance_to_coords_center_ray():
    cam = make_camera(vfov_deg=60.0, width=17, height=17)
    dist = jnp.full((17, 17), 2.0)
    pts = np.asarray(postproc.tof_distance_to_coords(dist, cam, CameraConfig()))
    # center pixel looks straight down -z: point at (0, 0, -2)
    np.testing.assert_allclose(pts[8, 8], [0, 0, -2.0], atol=1e-2)
    # every point lies at the measured distance from the camera
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 2.0, atol=1e-3)


def test_extract_component():
    img = np.stack([np.full((4, 4), i, np.float32) for i in range(3)], -1)
    one = np.asarray(postproc.extract_component(jnp.asarray(img), 1))
    np.testing.assert_allclose(one.squeeze(), 1.0)
