"""Round-3 coverage for lens distortion, ToF phase math, envmap importance
sampling, surround/stereo ray generation, and Perlin turbulence.

Reference semantics under test:
* LensDistortion distort/undistort, 3 models  (libwurblpt/optics.hpp:152-310)
* SensorTofAmcw energy->buckets->electrons->distance
  (libwurblpt/sensor_tof_amcw.hpp:147-213, 227-252)
* EnvironmentMap importance sampling d()/p()   (libwurblpt/envmap.hpp:120-210)
* Camera surround/stereo/ODS ray gen           (libwurblpt/camera.hpp:123-185)
* TexturePerlinNoise value/turbulence          (libwurblpt/texture_noise.hpp:165-252)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wurblpt_tpu import make_camera
from wurblpt_tpu.render.camera import (
    CameraConfig,
    DistortionModel,
    SurroundMode,
    camera_rays,
    distort_normalized,
    undistort_normalized,
)
from wurblpt_tpu.render.sensor import SensorEvent, SensorTofAmcw
from wurblpt_tpu.core.constants import SPEED_OF_LIGHT


# ---------------------------------------------------------------------------
# Lens distortion: distort(undistort(x)) ~= x for every model
# ---------------------------------------------------------------------------

def _norm_grid(extent=0.35, n=9):
    xs = np.linspace(-extent, extent, n)
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    return jnp.asarray(g, jnp.float32)


@pytest.mark.parametrize(
    "model,dist_k,dist_p,tol",
    [
        # OpenCV k1,k2,k3,p1,p2 iterative undistort (optics.hpp:279-308)
        (DistortionModel.OPENCV, (-0.2, 0.05, 0.002, 0, 0, 0), (0.01, -0.01), 1e-4),
        # Drap-Lefevre exact inverse series (optics.hpp:269-278): exact only
        # in the small-k limit; 4 terms leave O(k^5 r^10) residue.
        (DistortionModel.RADIAL_ONLY, (-0.05, 0.01, 0.001, 0, 0, 0), (0.0, 0.0), 2e-3),
        # Closed-form first-order inverse (optics.hpp:251-268)
        (DistortionModel.RADIAL_AND_PLANAR, (-0.1, 0.02, 0, 0, 0, 0), (0.01, -0.005), 3e-3),
    ],
)
def test_distort_undistort_roundtrip(model, dist_k, dist_p, tol):
    cam = make_camera(vfov_deg=60.0, width=64, height=64,
                      dist_k=dist_k, dist_p=dist_p)
    cfg = CameraConfig(distortion=model, undistort_iters=64)
    xy = _norm_grid()
    und = undistort_normalized(cam, cfg, xy)
    back = distort_normalized(cam, cfg, und)
    err = np.abs(np.asarray(back) - np.asarray(xy)).max()
    assert err < tol, f"model {model}: roundtrip error {err}"


def test_distortion_actually_distorts():
    cam = make_camera(vfov_deg=60.0, width=64, height=64,
                      dist_k=(-0.2, 0.05, 0.0, 0, 0, 0), dist_p=(0.0, 0.0))
    cfg = CameraConfig(distortion=DistortionModel.OPENCV)
    xy = jnp.asarray([[0.3, 0.2]], jnp.float32)
    d = distort_normalized(cam, cfg, xy)
    # Barrel distortion (k1 < 0) pulls points toward the center.
    assert float(jnp.linalg.norm(d)) < float(jnp.linalg.norm(xy))


# ---------------------------------------------------------------------------
# ToF AMCW phase math (sensor_tof_amcw.hpp:147-213 closed-form check)
# ---------------------------------------------------------------------------

def _tof_capture(opl_w, irradiance_w, sensor_kw=None):
    """Simulate the 4-phase-image capture on ONE synthetic path event."""
    phases = []
    for pi in range(4):
        s = SensorTofAmcw(phase_index=pi, **(sensor_kw or {}))
        ev = SensorEvent(
            radiance=jnp.asarray([[0.0, 0.0, 0.0, irradiance_w]]),
            path_component=jnp.zeros((1,), jnp.int32),
            geom_path_length=jnp.asarray([opl_w]),
            optical_path_length=jnp.asarray([[opl_w] * 4]),
            distance_to_light=jnp.zeros((1,)),
            active=jnp.ones((1,), bool),
        )
        acc = s.accumulate(jnp.zeros((1, 3)), ev)
        img = s.finish(acc, 1.0).reshape(1, 1, 3)
        phases.append(s.phase(img, shot_noise_factor=0.0))
    return SensorTofAmcw(**(sensor_kw or {})), phases


def test_tof_distance_reconstruction():
    # Round-trip optical path 5 m -> reported distance 2.5 m
    # (distance = c * phi / (4 pi f), phi = 2 pi * opl * f / c => opl / 2).
    # irradiance chosen below the saturation knee (~0.22 W/m^2 at defaults).
    s, phases = _tof_capture(opl_w=5.0, irradiance_w=0.1)
    dist, amp, inten = s.result(phases)
    assert abs(float(dist[0, 0]) - 2.5) < 1e-3
    # Unambiguous range: c / (2 f) ~ 7.49 m at 20 MHz; 2.5 m is inside.
    assert float(dist[0, 0]) < SPEED_OF_LIGHT / (2 * s.modulation_frequency)


def test_tof_distance_wraps_at_ambiguity_range():
    s20 = SensorTofAmcw()
    r_unamb = SPEED_OF_LIGHT / (2.0 * s20.modulation_frequency)
    opl = 2.0 * (r_unamb + 1.0)  # true one-way distance 1 m beyond range
    s, phases = _tof_capture(opl_w=opl, irradiance_w=0.1)
    dist, _, _ = s.result(phases)
    assert abs(float(dist[0, 0]) - 1.0) < 1e-2  # wrapped, as AMCW must


def test_tof_energy_to_electrons_and_amplitude():
    s = SensorTofAmcw(phase_index=0)
    irr = 0.1
    energy = irr * s.pixel_area * s.aperture_factor * s.exposure_time * s.duty_cycle
    electrons = energy * s.quantum_efficiency / s.energy_per_electron
    _, phases = _tof_capture(opl_w=4.0, irradiance_w=irr)
    # intensity bucket = total energy in electrons (sensor_tof_amcw.hpp:147-169)
    inten = float(phases[0][0, 0, 2])
    assert abs(inten - electrons) / electrons < 1e-4
    # amplitude = contrast-normalized demodulation = electron energy
    dist, amp, _ = SensorTofAmcw().result(phases)
    assert abs(float(amp[0, 0]) - electrons) / electrons < 1e-3


def test_tof_saturation_clips_electrons():
    s = SensorTofAmcw(phase_index=0, max_electrons=100.0)
    img = jnp.full((1, 1, 3), 1.0)  # 1 J per bucket -> astronomic electrons
    out = s.phase(img, shot_noise_factor=0.0)
    assert float(out.max()) == 100.0


# ---------------------------------------------------------------------------
# Envmap importance sampling: chi-square of env_sample vs env_pdf
# ---------------------------------------------------------------------------

def _blob_image(h, w, bright=50.0):
    img = np.full((h, w, 3), 0.05, np.float32)
    img[h // 4: h // 4 + 2, w // 3: w // 3 + 3] = bright
    return img


@pytest.mark.parametrize("cube", [False, True])
def test_envmap_is_sample_matches_pdf(cube):
    from wurblpt_tpu.render.envmap import (
        build_envmap_arrays, env_pdf, env_sample, sphere_to_square,
    )
    from wurblpt_tpu.scene.builder import (
        EnvironmentMapCube, EnvironmentMapEquiRect,
    )

    res = 16
    if cube:
        faces = [_blob_image(16, 16, bright=10.0 * (i + 1)) for i in range(6)]
        env = build_envmap_arrays(
            EnvironmentMapCube(faces=faces, importance_resolution=res))
    else:
        env = build_envmap_arrays(
            EnvironmentMapEquiRect(image=_blob_image(32, 64),
                                   importance_resolution=res))

    n_cells = res * res
    # pdf normalizes over the sphere: sum(pdf * cell_solid_angle) == 1
    cell_sa = 4.0 * np.pi / n_cells
    total = float(np.asarray(env.pdf_table).sum() * cell_sa)
    assert abs(total - 1.0) < 1e-3

    n = 1 << 17
    rng = np.random.default_rng(7)
    u3 = jnp.asarray(rng.random((n, 3)), jnp.float32)
    d, pdf = jax.jit(env_sample, static_argnums=())(env, u3)

    # returned pdf == env_pdf(d) (p() consistency, envmap.hpp:170-183)
    pdf2 = env_pdf(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-5)

    # chi-square: empirical cell counts vs expected = pdf * cell_sa * n
    uv = np.asarray(sphere_to_square(d))
    cj = np.clip((uv[:, 0] * res).astype(np.int64), 0, res - 1)
    ci = np.clip((uv[:, 1] * res).astype(np.int64), 0, res - 1)
    counts = np.bincount(ci * res + cj, minlength=n_cells).astype(np.float64)
    expected = np.asarray(env.pdf_table).reshape(-1) * cell_sa * n
    mask = expected >= 20.0
    assert mask.sum() > 10
    z = (counts[mask] - expected[mask]) / np.sqrt(expected[mask])
    # 5-sigma bound per cell plus a global chi-square sanity check
    assert np.abs(z).max() < 5.0, f"worst cell z={np.abs(z).max():.2f}"
    chi2_per_dof = float((z * z).mean())
    assert chi2_per_dof < 2.0, f"chi2/dof={chi2_per_dof:.2f}"


# ---------------------------------------------------------------------------
# Surround / stereo / ODS ray generation (camera.hpp:123-185)
# ---------------------------------------------------------------------------

def _gen_rays(cfg, width, height, eye_distance=0.064):
    cam = make_camera(vfov_deg=60.0, width=width, height=height,
                      eye_distance=eye_distance)
    ys, xs = np.meshgrid(np.arange(height) + 0.5, np.arange(width) + 0.5,
                         indexing="ij")
    pxy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)
    n = pxy.shape[0]
    o, d, _ = camera_rays(cam, cfg, pxy, width, height,
                          jnp.float32(0), jnp.float32(0),
                          jnp.zeros((n,)), jnp.zeros((n, 2)))
    return np.asarray(o).reshape(height, width, 3), np.asarray(d).reshape(height, width, 3)


def test_surround_360_direction_mapping():
    w = h = 32
    o, d = _gen_rays(CameraConfig(surround=SurroundMode.S360), w, h)
    assert np.abs(o).max() < 1e-6  # mono: all rays from the eye point
    # center pixel looks down -z
    np.testing.assert_allclose(d[h // 2, w // 2], [0, 0, -1], atol=0.12)
    # a full row sweeps 2pi: azimuth of adjacent columns differs by 2pi/w
    phi = np.arctan2(d[h // 2, :, 0], -d[h // 2, :, 2])
    dphi = np.diff(phi)
    dphi = np.where(dphi < -np.pi, dphi + 2 * np.pi, dphi)
    np.testing.assert_allclose(dphi, 2 * np.pi / w, atol=1e-5)
    # directions are unit
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_surround_180_covers_half_span():
    w = h = 32
    _, d = _gen_rays(CameraConfig(surround=SurroundMode.S180), w, h)
    phi = np.arctan2(d[h // 2, :, 0], -d[h // 2, :, 2])
    assert phi.min() > -np.pi / 2 - 1e-3 and phi.max() < np.pi / 2 + 1e-3
    assert phi.max() - phi.min() > np.pi * (1.0 - 2.0 / w) - 1e-3


def test_ods_stereo_eye_circle():
    w, h, e = 32, 64, 0.064
    cfg = CameraConfig(surround=SurroundMode.S360, stereo=True)
    o, d = _gen_rays(cfg, w, h, eye_distance=e)
    top, bot = o[: h // 2], o[h // 2:]
    # Both eyes sit on the ODS circle of diameter eye_distance
    # (camera.hpp:74-79, Google Jump).
    np.testing.assert_allclose(np.linalg.norm(top, axis=-1), e / 2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(bot, axis=-1), e / 2, atol=1e-6)
    # Left (top half) and right (bottom half) are antipodal per column.
    np.testing.assert_allclose(top, -bot, atol=1e-7)
    # The eye offset is horizontal and perpendicular to the view column's
    # horizontal direction.
    assert np.abs(o[..., 1]).max() < 1e-7
    horiz = d.copy()
    horiz[..., 1] = 0.0
    dots = np.sum(o * horiz, axis=-1)
    assert np.abs(dots).max() < 1e-6
    # Same pixel row in both halves looks in the same direction.
    np.testing.assert_allclose(d[: h // 2], d[h // 2:], atol=1e-6)


def test_conventional_stereo_eye_shift():
    w, h, e = 32, 64, 0.08
    cfg = CameraConfig(stereo=True)
    o, d = _gen_rays(cfg, w, h, eye_distance=e)
    # top half = left eye at -e/2 on camera x; bottom half = right at +e/2
    np.testing.assert_allclose(o[: h // 2, :, 0], -e / 2, atol=1e-7)
    np.testing.assert_allclose(o[h // 2:, :, 0], +e / 2, atol=1e-7)
    np.testing.assert_allclose(d[: h // 2], d[h // 2:], atol=1e-6)


# ---------------------------------------------------------------------------
# Perlin noise + turbulence (texture_noise.hpp:165-252)
# ---------------------------------------------------------------------------

def _noise_table(**kw):
    from wurblpt_tpu.scene.builder import (
        Lambertian, MeshInstance, NoiseTexture, Scene,
    )
    from wurblpt_tpu.scene.generator import generate_quad

    sc = Scene()
    sc.take_mesh_instance(MeshInstance(
        mesh=generate_quad(1.0, 1.0),
        material=Lambertian(albedo=NoiseTexture(**kw))))
    return sc.build()


def test_perlin_value_is_signed():
    from wurblpt_tpu.render.texture import sample_texture
    from wurblpt_tpu.scene.ir import TextureType

    scene = _noise_table(kind=TextureType.PERLIN_NOISE, frequency=16.0,
                         turbulence=False)
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.random((4096, 2)), jnp.float32)
    vals = np.asarray(sample_texture(
        scene.textures, jnp.zeros((4096,), jnp.int32), uv))[:, 0]
    # Signed Perlin (texture_noise.hpp:192-237): mean ~ 0, both signs present.
    assert vals.min() < -0.05 and vals.max() > 0.05
    assert abs(vals.mean()) < 0.05


def test_perlin_turbulence_is_abs_and_rougher():
    from wurblpt_tpu.render.texture import sample_texture
    from wurblpt_tpu.scene.ir import TextureType

    turb = _noise_table(kind=TextureType.PERLIN_NOISE, frequency=8.0,
                        octaves=7, gain=0.5, turbulence=True)
    rng = np.random.default_rng(4)
    uv = jnp.asarray(rng.random((4096, 2)), jnp.float32)
    tv = np.asarray(sample_texture(
        turb.textures, jnp.zeros((4096,), jnp.int32), uv))[:, 0]
    # |sum| is nonnegative and non-degenerate (texture_noise.hpp:239-251)
    assert tv.min() >= 0.0
    assert tv.std() > 0.02


def test_envmap_patch_fallback_matches(monkeypatch):
    """The large-envmap memory gate (four point gathers instead of the 4x
    2x2-patch image, PATCH_MAX_TEXELS) must be bit-equivalent."""
    from wurblpt_tpu.render import envmap as E
    from wurblpt_tpu.render.envmap import build_envmap_arrays, env_radiance
    from wurblpt_tpu.scene.builder import (
        EnvironmentMapCube, EnvironmentMapEquiRect,
    )

    rng = np.random.default_rng(3)
    d = rng.normal(size=(4096, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    eq = build_envmap_arrays(EnvironmentMapEquiRect(
        image=rng.random((32, 64, 3)).astype(np.float32)))
    cube = build_envmap_arrays(EnvironmentMapCube(
        faces=[rng.random((16, 16, 3)).astype(np.float32) for _ in range(6)]))
    for env in (eq, cube):
        a = np.asarray(env_radiance(env, d))
        monkeypatch.setattr(E, "PATCH_MAX_TEXELS", 1)
        b = np.asarray(env_radiance(env, d))
        monkeypatch.setattr(E, "PATCH_MAX_TEXELS", 1 << 21)
        np.testing.assert_array_equal(a, b)


def test_undistort_converges_at_default_iters():
    """The fixed-count undistort (8 iters default, was 32) must stay within
    the reference's own tolerance (0.001 px, optics.hpp:279-308) across a
    sweep of strong OpenCV coefficient sets (advisor round-4 finding)."""
    from wurblpt_tpu.render.camera import (
        CameraConfig, DistortionModel, distort_normalized,
        undistort_normalized,
    )
    from wurblpt_tpu import make_camera

    coeff_sets = [
        (-0.1, 0.02, 0.0, 0.001, -0.001),
        (-0.3, 0.12, -0.02, 0.004, 0.003),
        (0.25, -0.08, 0.01, -0.003, 0.002),
        (-0.45, 0.25, -0.05, 0.0, 0.0),
    ]
    w = h = 256
    # normalized coords spanning most of the 60-degree field
    g = np.linspace(-0.5, 0.5, 9, dtype=np.float32)
    ys, xs = np.meshgrid(g, g)
    xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    # 0.001 px at 256 px / ~1.15 normalized units -> ~4.5e-6 normalized;
    # allow 2x headroom
    tol = 2.0 * 0.001 * 1.155 / w
    for ks in coeff_sets:
        cam = make_camera(vfov_deg=60.0, width=w, height=h,
                          dist_k=(ks[0], ks[1], ks[2], 0.0, 0.0, 0.0),
                          dist_p=(ks[3], ks[4]))
        cfg = CameraConfig(distortion=DistortionModel.OPENCV)
        und = undistort_normalized(cam, cfg, xy)
        back = distort_normalized(cam, cfg, und)
        err = np.abs(np.asarray(back) - np.asarray(xy)).max()
        assert err < tol, (ks, err, tol)
