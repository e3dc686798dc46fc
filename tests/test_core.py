"""Core math/rng/sampler unit tests (modeled on the reference's tests/ suite:
test-transformation.cpp asserts, plus statistical warp checks the reference
lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wurblpt_tpu.core import rng, sampler
from wurblpt_tpu.core.transform import (
    Transformation,
    compose,
    from_lookat,
    inverse,
    mix,
    quat_from_axis_angle,
    quat_rotate,
    to_mat4,
    transform_point,
)
from wurblpt_tpu.core.onb import onb_from_normal, to_local, to_world
from wurblpt_tpu.core.vecmath import normalize


def test_rng_uniform_range_and_determinism():
    pix = jnp.arange(10000)
    u = rng.uniform4(pix, 3, 7, 11)
    assert u.shape == (10000, 4)
    un = np.asarray(u)
    assert un.min() >= 0.0 and un.max() < 1.0
    # mean ~ 0.5, independent streams differ
    assert abs(un.mean() - 0.5) < 0.01
    u2 = rng.uniform4(pix, 3, 7, 11)
    np.testing.assert_array_equal(np.asarray(u2), un)
    u3 = rng.uniform4(pix, 4, 7, 11)
    assert np.abs(np.asarray(u3) - un).max() > 0.1


def test_rng_chi_squared_uniformity():
    u = np.asarray(rng.uniform1(jnp.arange(100000), 0, 0, 42))
    hist, _ = np.histogram(u, bins=50, range=(0, 1))
    expected = len(u) / 50
    chi2 = ((hist - expected) ** 2 / expected).sum()
    # dof=49; 99.9th percentile ~ 85
    assert chi2 < 85.0, chi2


def _rand_u(n, d, salt):
    return rng.uniform4(jnp.arange(n), 0, 0, salt)[..., :d]


def test_cosine_direction_distribution():
    n = jnp.array([0.0, 0.0, 1.0]) * jnp.ones((50000, 3))
    d = np.asarray(sampler.cosine_direction(n, _rand_u(50000, 2, 1)))
    assert (d[:, 2] > -1e-6).all()
    # E[cos theta] for pdf cos/pi is 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01
    lens = np.linalg.norm(d, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)


def test_sphere_sampling_uniform():
    d = np.asarray(sampler.on_unit_sphere(_rand_u(50000, 2, 2)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(0)).max() < 0.02


def test_disk_concentric():
    p = np.asarray(sampler.in_unit_disk(_rand_u(50000, 2, 3)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform disk: E[r] = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.01


def test_cone_sampling():
    cos_max = jnp.full((20000,), 0.8)
    axis = jnp.array([0.0, 1.0, 0.0]) * jnp.ones((20000, 3))
    d = np.asarray(sampler.to_sphere(axis, cos_max, _rand_u(20000, 2, 4)))
    assert (d[:, 1] >= 0.8 - 1e-5).all()
    assert abs(d[:, 1].mean() - 0.9) < 0.01


def test_onb_orthonormal():
    n = normalize(jnp.asarray(np.random.RandomState(0).randn(1000, 3), jnp.float32))
    t, b = onb_from_normal(n)
    tn = np.asarray(jnp.sum(t * n, -1))
    tb = np.asarray(jnp.sum(t * b, -1))
    np.testing.assert_allclose(tn, 0, atol=1e-5)
    np.testing.assert_allclose(tb, 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(t * t, -1)), 1, atol=1e-5)
    # round trip
    v = normalize(jnp.asarray(np.random.RandomState(1).randn(1000, 3), jnp.float32))
    local = to_local(v, t, b, n)
    back = to_world(local, t, b, n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


class TestTransformation:
    """Mirrors tests/test-transformation.cpp:35-131: compose/rotate/scale vs
    hand-built matrices."""

    def test_translate_rotate_scale_matrix(self):
        tf = Transformation.make(
            translation=(1.0, 2.0, 3.0),
            rotation=quat_from_axis_angle((0, 0, 1), jnp.pi / 2),
            scale=(2.0, 2.0, 2.0),
        )
        m = np.asarray(to_mat4(tf))
        expect = np.array(
            [[0, -2, 0, 1], [2, 0, 0, 2], [0, 0, 2, 3], [0, 0, 0, 1]], np.float32
        )
        np.testing.assert_allclose(m, expect, atol=1e-4)

    def test_compose_matches_matrix_product(self):
        a = Transformation.make((1, 0, 0), quat_from_axis_angle((0, 1, 0), 0.7), (1, 1, 1))
        b = Transformation.make((0, 2, 0), quat_from_axis_angle((1, 0, 0), -0.3), (0.5, 0.5, 0.5))
        ab = compose(a, b)
        m = np.asarray(to_mat4(a)) @ np.asarray(to_mat4(b))
        np.testing.assert_allclose(np.asarray(to_mat4(ab)), m, atol=1e-4)

    def test_inverse(self):
        tf = Transformation.make((1, 2, 3), quat_from_axis_angle((1, 1, 0), 1.1), (2, 2, 2))
        p = jnp.array([0.3, -0.4, 0.9])
        q = transform_point(inverse(tf), transform_point(tf, p))
        np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=1e-5)

    def test_mix_endpoints_and_midpoint(self):
        a = Transformation.make((0, 0, 0), quat_from_axis_angle((0, 1, 0), 0.0))
        b = Transformation.make((2, 0, 0), quat_from_axis_angle((0, 1, 0), jnp.pi / 2))
        m0 = mix(a, b, 0.0)
        m1 = mix(a, b, 1.0)
        mh = mix(a, b, 0.5)
        np.testing.assert_allclose(np.asarray(m0.translation), [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m1.translation), [2, 0, 0], atol=1e-6)
        # slerp midpoint = rotation by pi/4
        expect = np.asarray(quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 4))
        np.testing.assert_allclose(np.abs(np.asarray(mh.rotation)), np.abs(expect), atol=1e-5)

    def test_lookat(self):
        tf = from_lookat((0, 0, 5), (0, 0, 0))
        # camera looks down -z: forward dir in world = rotate(q, -z)
        fwd = quat_rotate(tf.rotation, jnp.array([0.0, 0.0, -1.0]))
        np.testing.assert_allclose(np.asarray(fwd), [0, 0, -1], atol=1e-5)
        up = quat_rotate(tf.rotation, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(up), [0, 1, 0], atol=1e-5)


def test_power_heuristic():
    assert float(sampler.power_heuristic(jnp.float32(1.0), jnp.float32(0.0))) == 1.0
    assert abs(float(sampler.power_heuristic(jnp.float32(1.0), jnp.float32(1.0))) - 0.5) < 1e-6
    assert float(sampler.power_heuristic(jnp.float32(0.0), jnp.float32(0.0))) == 0.0
