"""Color-science parity (libwurblpt/color.hpp:37-306): CIE color-matching
functions, D65, XYZ<->RGB round trips, sRGB transfer, quantization."""

import numpy as np

import jax.numpy as jnp

from wurblpt_tpu.core import color


def test_xyz_rgb_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    back = color.xyz_to_rgb(color.rgb_to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_srgb_roundtrip_and_anchors():
    x = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32))
    back = color.srgb_to_rgb(color.rgb_to_srgb(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # anchors: black and white are fixed points
    np.testing.assert_allclose(float(color.rgb_to_srgb(jnp.float32(0.0))), 0.0,
                               atol=1e-7)
    np.testing.assert_allclose(float(color.rgb_to_srgb(jnp.float32(1.0))), 1.0,
                               atol=1e-6)


def test_cmf_peaks_and_support():
    """Gaussian-approximated CIE 1931 CMFs (color.hpp:37-66): y-bar peaks
    near 555 nm, x-bar has its main peak near 600 nm, z-bar near 450 nm, and
    all three vanish outside the visible range."""
    lam = jnp.asarray(np.arange(380.0, 741.0, 1.0, dtype=np.float32))
    xyz = np.asarray(color.color_matching_function(lam))
    lam_np = np.arange(380.0, 741.0, 1.0)
    assert abs(lam_np[xyz[:, 1].argmax()] - 555) < 15
    assert abs(lam_np[xyz[:, 0].argmax()] - 600) < 15
    assert abs(lam_np[xyz[:, 2].argmax()] - 450) < 15
    edge = np.asarray(color.color_matching_function(
        jnp.asarray([300.0, 830.0], jnp.float32)))
    assert np.abs(edge).max() < 0.02


def test_d65_is_normalized_near_560():
    """D65 is conventionally normalized to ~100 at 560 nm."""
    v = float(color.d65(jnp.float32(560.0)))
    assert 90.0 < v < 110.0
    # more energy in blue than deep red (daylight shape)
    assert float(color.d65(jnp.float32(460.0))) > float(color.d65(jnp.float32(700.0)))


def test_luminance_weights():
    assert abs(float(color.rgb_luminance(jnp.asarray([1.0, 0, 0]))) - 0.2126) < 1e-3
    assert abs(float(color.rgb_luminance(jnp.asarray([0, 1.0, 0]))) - 0.7152) < 1e-3
    assert abs(float(color.rgb_luminance(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0) < 1e-3


def test_byte_float_quantization():
    b = jnp.asarray(np.arange(256, dtype=np.int32))
    f = color.byte_to_float(b)
    back = np.asarray(color.float_to_byte(f))
    np.testing.assert_array_equal(back, np.arange(256))
