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


# ---------------------------------------------------------------------------
# Participating media (hitable_medium.hpp:38-99)
# ---------------------------------------------------------------------------

def _medium_scene(density=1.0, radius=1.0):
    from wurblpt_tpu.scene.builder import MediumObject, PhaseIso, SphereObject

    sc = Scene()
    sc.take_medium(
        MediumObject(
            boundary=SphereObject(center=(0, 0, 0), radius=radius,
                                  material=PhaseIso()),
            density=density,
            phase=PhaseIso(albedo=(1.0, 1.0, 1.0)),
        )
    )
    # A backdrop so the scene has at least one solid prim.
    wall = transform_mesh(generate_quad(10.0, 10.0), translate=(0, 0, -5))
    sc.take_mesh_instance(MeshInstance(mesh=wall, material=Lambertian()))
    return sc.build()


def test_medium_free_path_transmittance():
    """Rays through a sphere medium of density rho, chord 2r, scatter with
    probability 1 - exp(-2*r*rho); scatter points lie inside the boundary."""
    from wurblpt_tpu.render.media import apply_media

    rho, r = 0.7, 1.0
    scene = _medium_scene(density=rho, radius=r)
    static = SceneStatic.from_scene(scene)
    assert static.has_media
    n = 8192
    o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    t_min = jnp.full((n,), 1e-4)
    # Solid hit = backdrop at t = 8.
    t_s = jnp.full((n,), 8.0)
    prim_s = jnp.zeros((n,), jnp.int32)
    pid = jnp.arange(n, dtype=jnp.int32)
    sid = jnp.zeros((n,), jnp.int32)
    t, prim, _, _, mmask, mmat = apply_media(
        scene, o, d, t_min, t_s, prim_s, jnp.zeros((n,)), jnp.zeros((n,)),
        pid, sid, jnp.int32(0), 0
    )
    frac = float(jnp.mean(mmask))
    expect = 1.0 - np.exp(-2.0 * r * rho)
    assert abs(frac - expect) < 0.02, (frac, expect)
    # Scatter points inside the sphere: entry t=2, exit t=4.
    ts = np.asarray(t)[np.asarray(mmask)]
    assert ts.min() >= 2.0 - 1e-3 and ts.max() <= 4.0 + 1e-3
    # Phase material id patched in.
    assert np.all(np.asarray(mmat)[np.asarray(mmask)] >= 0)


def test_medium_render_smoke():
    """End-to-end render with a medium: finite image, medium dims the
    background where the sphere covers it."""
    from wurblpt_tpu.render.integrator import render_frame
    from wurblpt_tpu.scene.builder import EnvironmentMapConstant

    scene_b = _medium_scene(density=2.0, radius=1.0)

    from wurblpt_tpu.scene.builder import MediumObject, PhaseIso, SphereObject

    sc = Scene()
    sc.take_medium(
        MediumObject(
            boundary=SphereObject(center=(0, 0, 0), radius=1.0,
                                  material=PhaseIso()),
            density=3.0,
            phase=PhaseIso(albedo=(0.2, 0.2, 0.2)),  # dark smoke
        )
    )
    sc.set_environment_map(EnvironmentMapConstant(radiance=(1.0, 1.0, 1.0)))
    scene = sc.build()
    static = SceneStatic.from_scene(scene)
    from wurblpt_tpu.core.transform import Transformation

    cam = make_camera(
        transformation=Transformation.make(translation=(0.0, 0.0, 4.0)),
        vfov_deg=40.0, width=24, height=24,
    )
    img = render_frame(scene, static, cam, CameraConfig(), SensorRGB(),
                       24, 24, 3, params=RenderParams(max_path_components=16))
    a = np.asarray(img)
    assert np.all(np.isfinite(a))
    # Center pixel (through thick dark smoke) is darker than a corner (env).
    assert a[12, 12, :3].mean() < 0.6 * a[0, 0, :3].mean()


# ---------------------------------------------------------------------------
# Animation at intersection time (hitable_triangle.hpp ANIMATE path)
# ---------------------------------------------------------------------------

def _animated_quad_scene(use_bvh):
    """A unit quad at z=0 keyframed to slide +2x over t in [0, 1]."""
    from wurblpt_tpu.core.transform import Transformation
    from wurblpt_tpu.scene.builder import AnimationKeyframes

    sc = Scene()
    aid = sc.take_animation(AnimationKeyframes(
        times=[0.0, 1.0],
        transformations=[
            Transformation.make(translation=(0.0, 0.0, 0.0)),
            Transformation.make(translation=(2.0, 0.0, 0.0)),
        ],
    ))
    quad = generate_quad(0.5, 0.5)
    sc.take_mesh_instance(
        MeshInstance(mesh=quad, material=Lambertian(), animation=aid)
    )
    return sc.build(use_bvh=use_bvh, t0=0.0, t1=1.0)


@pytest.mark.parametrize("use_bvh", [False, True])
def test_animated_quad_moves(use_bvh):
    from wurblpt_tpu.render.intersect import scene_closest_hit
    from wurblpt_tpu.scene.animation import make_anim_ctx

    scene = _animated_quad_scene(use_bvh)
    o = jnp.array([[0.0, 0.0, 2.0], [2.0, 0.0, 2.0], [0.0, 0.0, 2.0]])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    t_min = jnp.full((3,), 1e-4)
    t_max = jnp.full((3,), 1e9)
    # Ray 0 at time 0 hits (quad at origin); ray 1 at time 1 hits (quad at
    # x=2); ray 2 at time 1 misses (quad moved away).
    ctx = make_anim_ctx(scene.anims, jnp.array([0.0, 1.0, 1.0]))
    hr = scene_closest_hit(scene, o, d, t_min, t_max, anim_ctx=ctx)
    h = np.asarray(hr.hit)
    assert h.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(hr.t)[:2], [2.0, 2.0], atol=1e-4)
    # World position of ray 1 hit is at the MOVED location.
    np.testing.assert_allclose(np.asarray(hr.position)[1], [2.0, 0.0, 0.0],
                               atol=1e-4)


def test_animated_scaled_sphere_normals():
    """Nonuniform scale animation: normals transformed by the inverse-
    transpose stay perpendicular to the scaled surface."""
    from wurblpt_tpu.core.transform import Transformation
    from wurblpt_tpu.render.intersect import scene_closest_hit
    from wurblpt_tpu.scene.animation import make_anim_ctx
    from wurblpt_tpu.scene.builder import AnimationKeyframes, SphereObject

    sc = Scene()
    aid = sc.take_animation(AnimationKeyframes(
        times=[0.0, 1.0],
        transformations=[
            Transformation.make(scale=(1.0, 1.0, 1.0)),
            Transformation.make(scale=(3.0, 1.0, 1.0)),
        ],
    ))
    sc.take_sphere(SphereObject(center=(0, 0, 0), radius=1.0,
                                material=Lambertian(), animation=aid))
    scene = sc.build(use_bvh=False, t0=0.0, t1=1.0)

    # Hit the ellipsoid (a=3, b=c=1) at t=1 from a diagonal direction.
    o = jnp.array([[5.0, 5.0, 0.0]])
    d = -o / jnp.linalg.norm(o)
    ctx = make_anim_ctx(scene.anims, jnp.array([1.0]))
    hr = scene_closest_hit(scene, o, d, jnp.array([1e-4]), jnp.array([1e9]),
                           anim_ctx=ctx)
    assert bool(hr.hit[0])
    p = np.asarray(hr.position)[0]
    # On the ellipsoid surface: (x/3)^2 + y^2 + z^2 = 1.
    assert abs((p[0] / 3.0) ** 2 + p[1] ** 2 + p[2] ** 2 - 1.0) < 1e-3
    # Analytic ellipsoid normal ~ (x/9, y, z).
    n_ana = np.array([p[0] / 9.0, p[1], p[2]])
    n_ana /= np.linalg.norm(n_ana)
    np.testing.assert_allclose(np.asarray(hr.normal)[0], n_ana, atol=1e-3)


def test_motion_blur_render_smoke():
    """A moving emissive quad rendered over [0,1] leaves a streak covering
    both endpoints."""
    from wurblpt_tpu.core.transform import Transformation
    from wurblpt_tpu.render.integrator import render_frame
    from wurblpt_tpu.scene.builder import AnimationKeyframes

    sc = Scene()
    aid = sc.take_animation(AnimationKeyframes(
        times=[0.0, 1.0],
        transformations=[
            Transformation.make(translation=(-0.6, 0.0, 0.0)),
            Transformation.make(translation=(0.6, 0.0, 0.0)),
        ],
    ))
    quad = generate_quad(0.15, 0.15)
    sc.take_mesh_instance(
        MeshInstance(mesh=quad, material=LightDiffuse(radiance=(4, 4, 4)),
                     animation=aid),
        hot_spot=True,
    )
    scene = sc.build(t0=0.0, t1=1.0)
    static = SceneStatic.from_scene(scene)
    cam = make_camera(
        transformation=Transformation.make(translation=(0.0, 0.0, 2.5)),
        vfov_deg=50.0, width=32, height=32,
    )
    img = render_frame(scene, static, cam, CameraConfig(), SensorRGB(),
                       32, 32, 4, t0=0.0, t1=1.0,
                       params=RenderParams(max_path_components=2))
    a = np.asarray(img)[..., 0]
    assert np.all(np.isfinite(a))
    mid = a[14:18, :]
    # Emission is visible near both ends of the sweep and absent at the top
    # edge row (no geometry there).
    assert mid[:, 4:10].max() > 0.5
    assert mid[:, 22:28].max() > 0.5
    assert a[0, :].max() < 0.25


def test_cube_envmap_bilinear_lookup():
    """Cube faces are sampled BILINEARLY with edge clamp, matching the
    reference's TextureImage faces (texture_image.hpp:85-90, 182-212) —
    round 4 replaced the earlier nearest-texel shortcut."""
    import numpy as np
    import jax.numpy as jnp

    from wurblpt_tpu.render.envmap import _cube_lookup

    H = W = 4
    img = np.zeros((6, H, W, 4), np.float32)
    img[0, :, :, 0] = np.arange(H * W, dtype=np.float32).reshape(H, W)
    img = jnp.asarray(img)

    def dir_for(u, v):
        sc = 2 * u - 1.0
        tc = 2 * v - 1.0
        return jnp.asarray([[1.0, -tc, -sc]])   # +x face, ax = 1

    # texel center is exact
    v = _cube_lookup(img, dir_for((2 + 0.5) / W, (1 + 0.5) / H))
    assert float(v[0, 0]) == 6.0
    # midpoint of two texels is their average
    v = _cube_lookup(img, dir_for(3.0 / W, (1 + 0.5) / H))
    assert float(v[0, 0]) == 6.5
    # face edge clamps to the last texel
    v = _cube_lookup(img, dir_for(0.999999, (1 + 0.5) / H))
    assert float(v[0, 0]) == 7.0
