"""Gradient breadth (VERDICT round-2 item 7): FD checks beyond flat albedo —
texture texels, GGX roughness, envmap radiance, and ToF geometry ("grads to
geometry", BASELINE config 4).

Same methodology as tests/test_gradients.py: the counter-based RNG makes the
render a deterministic function of the parameters, so central differences of
the SAME sampled estimator are the ground-truth derivative.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wurblpt_tpu import (
    CameraConfig,
    RenderParams,
    SceneStatic,
    SensorRGB,
    make_camera,
)
from wurblpt_tpu.core.transform import from_lookat
from wurblpt_tpu.render.integrator import render_frame
from wurblpt_tpu.render.sensor import SensorTofAmcw
from wurblpt_tpu.scene import builder as B
from wurblpt_tpu.scene import generator as G

PARAMS = RenderParams(max_path_components=3, differentiable=True)


def _fd_check(loss, x0, eps, rtol=5e-2, atol=1e-6):
    g = float(jax.grad(loss)(jnp.float32(x0)))
    fd = (float(loss(jnp.float32(x0 + eps))) -
          float(loss(jnp.float32(x0 - eps)))) / (2 * eps)
    assert abs(fd) > atol, f"degenerate FD ({fd}) — test setup sees no effect"
    np.testing.assert_allclose(g, fd, rtol=rtol)
    return g, fd


def _textured_quad_scene(tex_img):
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(
        mesh=G.generate_quad(1.0, 1.0),
        material=B.Lambertian(albedo=B.ImageTexture(image=tex_img, srgb=False))))
    sc.take_sphere(B.SphereObject((0.5, 0.8, 2.5), 0.3,
                                  B.LightDiffuse(radiance=(14.0,) * 3)),
                   hot_spot=True)
    return sc.build()


def test_grad_texture_texel():
    """d(image)/d(one texel of an albedo texture) via the bilinear gather."""
    tex = np.full((4, 4, 3), 0.5, np.float32)
    scene = _textured_quad_scene(tex)
    static = SceneStatic.from_scene(scene)
    w = h = 16
    cam = make_camera(transformation=from_lookat((0, 0, 2.2), (0, 0, 0)),
                      vfov_deg=45.0, width=w, height=h)

    def loss(s):
        img_data = scene.textures.img_data.at[0, 1, 1, :].set(s)
        sc = scene._replace(textures=scene.textures._replace(img_data=img_data))
        img = render_frame(sc, static, cam, CameraConfig(), SensorRGB(),
                           w, h, 2, params=PARAMS)
        return jnp.mean(img)

    # f16 texel stack quantizes the FD probe: use a large step
    _fd_check(loss, 0.5, 1.0 / 16, rtol=8e-2)


def test_grad_ggx_roughness():
    sc = B.Scene()
    sc.take_sphere(B.SphereObject((0.0, 0.0, 0.0), 0.5,
                                  B.GGX(albedo=(0.9, 0.9, 0.9), roughness=0.3)))
    sc.take_sphere(B.SphereObject((1.2, 1.5, 2.0), 0.4,
                                  B.LightDiffuse(radiance=(20.0,) * 3)),
                   hot_spot=True)
    scene = sc.build()
    static = SceneStatic.from_scene(scene)
    w = h = 16
    cam = make_camera(transformation=from_lookat((0, 0, 2.5), (0, 0, 0)),
                      vfov_deg=40.0, width=w, height=h)
    ggx_mat = int(np.asarray(scene.materials.typ).tolist().index(2))

    def loss(r):
        p0 = scene.materials.p0.at[ggx_mat, 0].set(r).at[ggx_mat, 1].set(r)
        sc2 = scene._replace(materials=scene.materials._replace(p0=p0))
        img = render_frame(sc2, static, cam, CameraConfig(), SensorRGB(),
                           w, h, 2, params=PARAMS)
        return jnp.mean(img)

    # VNDF sampling moves with roughness under common random numbers; the FD
    # picks up discrete NEE-visibility/RR flips autodiff correctly excludes,
    # so agreement is approximate (sign + scale), unlike the linear cases.
    _fd_check(loss, 0.3, 3e-2, rtol=3e-1)


def test_grad_envmap_radiance():
    """d(image)/d(envmap brightness scale) — linear, must match FD tightly.

    The importance tables are NOT re-derived inside the loss (detached
    sampling distribution); a pure scale keeps the sample placement fixed, so
    the gradient is exact.
    """
    from wurblpt_tpu.utils import scenes as S

    scene = S.envmap_spheres(cube=False).build()
    static = SceneStatic.from_scene(scene)
    w = h = 16
    cam = make_camera(transformation=from_lookat((0.0, 0.6, 4.0), (0, 0, 0)),
                      vfov_deg=40.0, width=w, height=h)
    base = scene.envmap.image

    def loss(s):
        sc2 = scene._replace(envmap=scene.envmap._replace(image=base * s))
        img = render_frame(sc2, static, cam, CameraConfig(), SensorRGB(),
                           w, h, 2, params=PARAMS)
        return jnp.mean(img)

    g, fd = _fd_check(loss, 1.0, 1e-2, rtol=2e-2)
    # linearity: d(loss)/ds at s=1 equals loss(1) (all radiance is env-sourced)
    np.testing.assert_allclose(g, float(loss(jnp.float32(1.0))), rtol=5e-2)


def test_grad_tof_geometry():
    """BASELINE config 4 "grads to geometry": moving a wall changes the
    optical path length, hence the AMCW phase buckets — d(bucket)/d(z) must
    match finite differences through the full render."""
    def build(z):
        sc = B.Scene()
        # receiver wall whose distance is the parameter
        wm = G.generate_quad(1.5, 1.5)
        sc.take_mesh_instance(B.MeshInstance(
            mesh=wm, material=B.Lambertian(albedo=(0.7,) * 3),
            transformation=B.Transformation.make(translation=(0.0, 0.0, z))))
        # ToF light rigidly offset beside the camera (co-locating it would
        # enclose the camera origin inside the emitter sphere and kill every
        # path at bounce 0)
        sc.take_sphere(B.SphereObject((0.3, 0.3, 2.0), 0.08,
                                      B.LightTof(radiance_w=120.0,
                                                 half_angle=np.pi / 3)),
                       hot_spot=True)
        return sc.build()

    static = SceneStatic.from_scene(build(0.0))
    w = h = 8
    cam = make_camera(transformation=from_lookat((0, 0, 2.0), (0, 0, 0)),
                      vfov_deg=50.0, width=w, height=h)
    sensor = SensorTofAmcw(phase_index=1)  # tau=pi/2: bucket difference ~ sin(phi)

    # Geometry enters through the TRANSFORMED VERTICES: differentiate w.r.t.
    # a z-shift applied to the already-flattened triangle array.
    scene0 = build(0.0)

    def loss(z):
        dz = jnp.zeros(3).at[2].set(z)
        tris = scene0.tris._replace(
            p0=scene0.tris.p0 + dz,
            v1=scene0.tris.v1 + dz if scene0.tris.v1 is not None else None,
            v2=scene0.tris.v2 + dz if scene0.tris.v2 is not None else None,
        )
        sc2 = scene0._replace(tris=tris)
        img = render_frame(sc2, static, cam, CameraConfig(), sensor,
                           w, h, 2, params=PARAMS)
        # a-b bucket difference integrates contrast*cos(tau+phi): phase-
        # sensitive, so it moves with geometry through opticalPathLength.w.
        # Express in ELECTRONS — raw buckets are joules (~1e-15), far below
        # any sane FD threshold.
        electrons = sensor.quantum_efficiency / sensor.energy_per_electron
        return jnp.mean(img[..., 0] - img[..., 1]) * electrons

    _fd_check(loss, 0.0, 5e-3, rtol=1.5e-1, atol=1e-3)


def test_grad_rgl_table_values():
    """Gradients flow into the MEASURED RGL reflectance tables: d(image)/d(s)
    for a scale s on the rgb table is linear, so FD must match autodiff
    tightly (the Marginal2D gathers/interp are differentiable end to end)."""
    from wurblpt_tpu.materials import rgl as rgl_mod

    def smooth(shape, s, lo=0.05, hi=1.0):
        rs = np.random.RandomState(s)
        a = rs.uniform(lo, hi, shape).astype(np.float32)
        for ax in range(a.ndim):
            a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
        return a.astype(np.float32)

    T = 4
    fields = dict(
        phi_i=np.zeros((1,), np.float32),
        theta_i=np.linspace(0.0, np.pi / 2, T).astype(np.float32),
        ndf=smooth((16, 16), 1),
        sigma=smooth((16, 16), 2, 0.2, 0.4),
        vndf=smooth((1, T, 16, 16), 3),
        luminance=smooth((1, T, 8, 8), 4),
        rgb=smooth((1, T, 3, 8, 8), 5),
    )
    sc = B.Scene()
    sc.take_rgl_table("m", rgl_mod.load_rgl_material(fields))
    rid = sc.take_material(B.RGLMaterial(table_name="m"))
    sc.take_mesh_instance(B.MeshInstance(mesh=G.generate_quad(1.2, 1.2),
                                         material=rid))
    sc.take_sphere(B.SphereObject((0.4, 0.9, 2.2), 0.3,
                                  B.LightDiffuse(radiance=(14.0,) * 3)),
                   hot_spot=True)
    scene = sc.build()
    static = SceneStatic.from_scene(scene)
    w = h = 12
    cam = make_camera(transformation=from_lookat((0, 0, 2.2), (0, 0, 0)),
                      vfov_deg=45.0, width=w, height=h)

    base_rgb = scene.rgl.rgb

    def loss(s):
        sc2 = scene._replace(rgl=scene.rgl._replace(rgb=base_rgb * s))
        img = render_frame(sc2, static, cam, CameraConfig(), SensorRGB(),
                           w, h, 2, params=PARAMS)
        return jnp.mean(img)

    g, fd = _fd_check(loss, 1.0, 1e-2, rtol=3e-2)
    # direct-lighting dominated: loss is ~linear in the table scale
    assert g > 0
