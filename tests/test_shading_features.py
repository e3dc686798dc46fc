"""Normal mapping, media, and animation shading features.

Reference behaviors: Material::normalAt/tangentSpaceAt (material.hpp:195-228),
HitableMedium free-path sampling (hitable_medium.hpp:38-99), animated hitables
(hitable_triangle.hpp ANIMATE instantiations + animation_keyframes.hpp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wurblpt_tpu import (
    CameraConfig,
    RenderParams,
    SceneStatic,
    SensorRGB,
    make_camera,
)
from wurblpt_tpu.render.bsdf import apply_normal_map
from wurblpt_tpu.render.intersect import scene_closest_hit
from wurblpt_tpu.scene.builder import (
    ImageTexture,
    Lambertian,
    LightDiffuse,
    MeshInstance,
    Scene,
)
from wurblpt_tpu.scene.generator import generate_quad, transform_mesh


def _flat_quad_scene(normal_map=None):
    sc = Scene()
    quad = generate_quad(1.0, 1.0)  # z=0 plane, +z normal
    sc.take_mesh_instance(
        MeshInstance(mesh=quad, material=Lambertian(albedo=(0.8, 0.8, 0.8),
                                                    normal_map=normal_map))
    )
    light = transform_mesh(generate_quad(0.3, 0.3), translate=(0, 0, 3))
    sc.take_mesh_instance(
        MeshInstance(mesh=light, material=LightDiffuse(radiance=(5.0, 5.0, 5.0))),
        hot_spot=True,
    )
    return sc.build()


def test_normal_map_identity_leaves_normal():
    # A (0.5, 0.5, 1) normal map encodes the unperturbed +z normal.
    nm = ImageTexture(image=np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32), srgb=False)
    scene = _flat_quad_scene(normal_map=nm)
    static = SceneStatic.from_scene(scene)
    assert static.has_normal_maps

    o = jnp.array([[0.0, 0.0, 2.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hr = scene_closest_hit(scene, o, d, jnp.array([1e-4]), jnp.array([1e9]))
    hr2 = apply_normal_map(scene, static, hr)
    np.testing.assert_allclose(np.asarray(hr2.normal), np.asarray(hr.normal),
                               atol=1e-5)


def test_normal_map_tilts_normal():
    # Encode a normal tilted toward +x in tangent space.
    tilt = np.array([np.sin(0.4), 0.0, np.cos(0.4)])
    texel = (tilt + 1.0) / 2.0
    nm = ImageTexture(image=np.full((4, 4, 3), texel, np.float32), srgb=False)
    scene = _flat_quad_scene(normal_map=nm)
    static = SceneStatic.from_scene(scene)

    o = jnp.array([[0.0, 0.0, 2.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hr = scene_closest_hit(scene, o, d, jnp.array([1e-4]), jnp.array([1e9]))
    hr2 = apply_normal_map(scene, static, hr)
    n = np.asarray(hr2.normal)[0]
    assert abs(np.linalg.norm(n) - 1.0) < 1e-5
    # Perturbed away from +z by the encoded angle (tangent frame may flip the
    # in-plane direction; the tilt magnitude is what is invariant).
    assert abs(n[2] - np.cos(0.4)) < 1e-3
    assert abs(abs(n[0]) - np.sin(0.4)) < 1e-3
    # Tangent re-orthogonalized.
    assert abs(np.dot(np.asarray(hr2.tangent)[0], n)) < 1e-4
