"""RGL measured-material tests: warp round-trips, sample/eval consistency,
and scene wiring (reference: material_rgl.hpp + powitacq_rgb.inl semantics)."""

import numpy as np
import jax.numpy as jnp

from wurblpt_tpu.materials import rgl


def _smooth_positive(shape, seed, lo=0.2, hi=1.0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(lo, hi, size=shape).astype(np.float32)
    # Smooth along the last two axes so bilinear patches are well behaved.
    for ax in (-1, -2):
        a = 0.5 * a + 0.25 * (np.roll(a, 1, ax) + np.roll(a, -1, ax))
    return a.astype(np.float32)


def _synthetic_material(seed=0, P=1, T=4, hv=16, wv=16, hl=8, wl=8):
    theta_i = np.linspace(0.0, np.pi / 2, T).astype(np.float32)
    phi_i = np.zeros((P,), np.float32)
    fields = dict(
        phi_i=phi_i,
        theta_i=theta_i,
        ndf=_smooth_positive((hv, wv), seed + 1),
        sigma=_smooth_positive((hv, wv), seed + 2, 0.2, 0.4),
        vndf=_smooth_positive((P, T, hv, wv), seed + 3),
        luminance=_smooth_positive((P, T, hl, wl), seed + 4),
        rgb=_smooth_positive((P, T, 3, hl, wl), seed + 5),
    )
    return rgl.load_rgl_material(fields)


def _tables():
    return rgl.stack_rgl_tables([_synthetic_material()])


def _wi_batch(n, seed=1):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0.05, 1.4, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    wi = np.stack(
        [np.cos(phi) * np.sin(theta), np.sin(phi) * np.sin(theta), np.cos(theta)],
        -1,
    ).astype(np.float32)
    return jnp.asarray(wi)


def test_warp_sample_invert_roundtrip():
    """invert(sample(u)) must reproduce u and its density (Marginal2D identity)."""
    tables = _tables()
    n = 256
    wi = _wi_batch(n)
    mid = jnp.zeros((n,), jnp.int32)
    fr = rgl._prepare(tables, mid, wi)
    warp = rgl._warp(fr, "vndf")
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)).astype(np.float32))

    pos, pdf_s = warp.sample(u, tables.vndf_marg.shape[3], tables.vndf_cond.shape[4])
    u_back, pdf_i = warp.invert(pos)

    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pdf_i), np.asarray(pdf_s), rtol=2e-3)
    # eval at the warped position must agree with the sampling density.
    pdf_e = warp.eval(pos)
    np.testing.assert_allclose(np.asarray(pdf_e), np.asarray(pdf_s), rtol=2e-3)


def test_sample_eval_consistency():
    """rgl_eval at a sampled direction must reproduce the sample's f*cos and pdf
    (MaterialRGL::scatter vs scatterToDirection parity)."""
    tables = _tables()
    n = 512
    wi = _wi_batch(n, seed=3)
    mid = jnp.zeros((n,), jnp.int32)
    rng = np.random.default_rng(11)
    u2 = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)).astype(np.float32))

    wo, f_s, pdf_s, ok = rgl.rgl_sample(tables, mid, wi, u2)
    f_e, pdf_e = rgl.rgl_eval(tables, mid, wi, wo)

    ok = np.asarray(ok)
    assert ok.mean() > 0.5  # most samples should land in the upper hemisphere
    np.testing.assert_allclose(
        np.asarray(pdf_e)[ok], np.asarray(pdf_s)[ok], rtol=5e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(f_e)[ok], np.asarray(f_s)[ok], rtol=5e-3, atol=1e-6
    )
    assert np.all(np.isfinite(np.asarray(f_s)))
    assert np.all(np.asarray(f_s)[ok] >= 0.0)
    # NIR channel of an RGB dataset is the average of RGB (material_rgl.hpp:45-46).
    fs = np.asarray(f_s)[ok]
    np.testing.assert_allclose(fs[:, 3], fs[:, :3].mean(-1), rtol=1e-3, atol=1e-6)


def test_pdf_is_a_density():
    """Monte-Carlo: E_uniform-hemisphere[pdf / (1/2pi)] ~= 1."""
    tables = _tables()
    n = 8192
    rng = np.random.default_rng(5)
    # uniform hemisphere directions
    z = rng.uniform(1e-3, 1.0, n)
    r = np.sqrt(1 - z * z)
    ph = rng.uniform(-np.pi, np.pi, n)
    wo = jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1), jnp.float32)
    wi = jnp.broadcast_to(
        jnp.asarray(np.array([0.3, 0.1, 1.0]) / np.linalg.norm([0.3, 0.1, 1.0]),
                    jnp.float32), (n, 3))
    mid = jnp.zeros((n,), jnp.int32)
    _, pdf = rgl.rgl_eval(tables, mid, wi, wo)
    integral = float(np.mean(np.asarray(pdf)) * 2.0 * np.pi)
    # The warp can land below the horizon (rejected, pdf contribution lost), so
    # the hemisphere mass equals the ACCEPTANCE rate of rgl_sample, not 1
    # (powitacq_rgb.inl sample(): invalid wo -> zero). Compare against it.
    rngs = np.random.default_rng(17)
    u2 = jnp.asarray(rngs.uniform(0.001, 0.999, (n, 2)).astype(np.float32))
    _, _, _, ok = rgl.rgl_sample(tables, mid, wi, u2)
    accept = float(np.asarray(ok).mean())
    assert abs(integral - accept) < 0.12, (integral, accept)
    assert 0.4 < integral <= 1.05, integral


def test_spectral_dataset_integration():
    """Spectral datasets integrate to RGB+NIR at load (material_rgl.hpp:137-153)."""
    P, T, S, H, W = 1, 3, 8, 4, 4
    wavelengths = np.linspace(380.0, 900.0, S).astype(np.float32)
    spectra = _smooth_positive((P, T, S, H, W), 9)
    fields = dict(
        phi_i=np.zeros((P,), np.float32),
        theta_i=np.linspace(0, np.pi / 2, T).astype(np.float32),
        ndf=_smooth_positive((H, W), 1),
        sigma=_smooth_positive((H, W), 2, 0.2, 0.4),
        vndf=_smooth_positive((P, T, H, W), 3),
        luminance=_smooth_positive((P, T, H, W), 4),
        spectra=spectra,
        wavelengths=wavelengths,
    )
    mat = rgl.load_rgl_material(fields, nir_wavelength=850.0)
    assert mat["rgb"].shape == (P, T, 4, H, W)
    # NIR channel = nearest-wavelength slice (material_rgl.hpp:151,167-181).
    nearest = int(np.argmin(np.abs(wavelengths - 850.0)))
    np.testing.assert_allclose(mat["rgb"][:, :, 3], spectra[:, :, nearest], atol=1e-6)
    # A flat unit spectrum must integrate to (approximately) white RGB.
    flat = dict(fields, spectra=np.ones((P, T, S, H, W), np.float32))
    mat_flat = rgl.load_rgl_material(flat)
    rgb = mat_flat["rgb"][0, 0, :3, 0, 0]
    assert np.all(rgb > 0.5) and np.all(rgb < 2.0), rgb


def test_scene_wiring():
    """RGLMaterial + take_rgl_table flow through flatten into SceneArrays.rgl."""
    from wurblpt_tpu.scene import builder as B
    from wurblpt_tpu.scene.flatten import flatten_scene
    from wurblpt_tpu.scene.ir import MaterialType

    scene = B.Scene()
    scene.take_rgl_table("synthetic", _synthetic_material())
    m = scene.take_material(B.RGLMaterial(table_name="synthetic"))
    scene.take_sphere(B.SphereObject(center=(0, 0, 0), radius=1.0, material=m))
    arrays = flatten_scene(scene)
    assert arrays.rgl.count == 1
    mat_typ = np.asarray(arrays.materials.typ)
    rgl_id = np.asarray(arrays.materials.rgl_id)
    assert MaterialType.RGL in mat_typ
    assert rgl_id[mat_typ == MaterialType.RGL][0] == 0
