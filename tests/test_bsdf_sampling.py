"""Sample <-> pdf consistency of the pdf-sampled BSDFs (GGX VNDF, Lambertian,
ModPhong): the directions drawn by bsdf_sample must be distributed according
to the pdf that bsdf_eval reports — the property MIS correctness rests on
(material_ggx.hpp:138-171 VNDF sampling vs :198,247 pdf).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wurblpt_tpu import SceneStatic
from wurblpt_tpu.render.bsdf import ScatterKind, bsdf_eval, bsdf_sample
from wurblpt_tpu.render.intersect import scene_closest_hit
from wurblpt_tpu.scene import builder as B
from wurblpt_tpu.scene.generator import generate_quad


def _hit_batch(material, n):
    """One shading point on a +z-normal quad, replicated to n lanes."""
    sc = B.Scene()
    sc.take_mesh_instance(B.MeshInstance(mesh=generate_quad(2.0, 2.0),
                                         material=material))
    scene = sc.build()
    static = SceneStatic.from_scene(scene)
    o = jnp.tile(jnp.asarray([[0.35, -0.2, 1.5]]), (n, 1))
    d = jnp.tile(jnp.asarray([[-0.25, 0.15, -1.0]]) /
                 np.linalg.norm([-0.25, 0.15, -1.0]), (n, 1))
    hr = scene_closest_hit(scene, o, d, jnp.full((n,), 1e-4),
                           jnp.full((n,), 1e9))
    assert bool(hr.hit.all())
    return scene, static, hr, d


@pytest.mark.parametrize("material,min_cons", [
    (B.Lambertian(albedo=(0.8,) * 3), 0.999),
    (B.GGX(albedo=(0.9,) * 3, roughness=0.45), 0.98),
    (B.GGX(albedo=(0.9,) * 3, roughness=(0.15, 0.6)), 0.98),  # anisotropic
    (B.ModPhong(diffuse=(0.4,) * 3, specular=(0.4,) * 3, shininess=40.0), 0.97),
])
def test_sample_pdf_matches_eval_pdf(material, min_cons):
    """bsdf_sample's reported pdf must equal bsdf_eval's pdf at the sampled
    direction (the identity the MIS power heuristic assumes)."""
    n = 1 << 14
    scene, static, hr, d = _hit_batch(material, n)
    rng = np.random.default_rng(3)
    u4 = jnp.asarray(rng.random((n, 4)), jnp.float32)
    u_lobe = jnp.asarray(rng.random(n), jnp.float32)
    sr = bsdf_sample(scene, static, hr, d, jnp.ones((n, 4)), u4, u_lobe,
                     u_lobe)
    is_rand = np.asarray(sr.kind) == ScatterKind.RANDOM
    assert is_rand.mean() > 0.9
    _, pdf_eval = bsdf_eval(scene, static, hr, d, sr.direction)
    ps = np.asarray(sr.pdf)[is_rand]
    pe = np.asarray(pdf_eval)[is_rand]
    rel = np.abs(ps - pe) / np.maximum(ps, 1e-6)
    frac_ok = (rel < 5e-3).mean()
    assert frac_ok >= min_cons, f"only {frac_ok:.4f} of pdfs consistent"


@pytest.mark.parametrize("material", [
    B.Lambertian(albedo=(0.8,) * 3),
    B.GGX(albedo=(0.9,) * 3, roughness=0.5),
])
def test_sampled_directions_follow_pdf(material):
    """Chi-square: histogram of sampled directions over hemisphere bins must
    match the bin masses of bsdf_eval's pdf (MC-integrated with uniform
    directions)."""
    n = 1 << 17
    scene, static, hr, d = _hit_batch(material, n)
    rng = np.random.default_rng(5)
    u4 = jnp.asarray(rng.random((n, 4)), jnp.float32)
    u_lobe = jnp.asarray(rng.random(n), jnp.float32)
    sr = bsdf_sample(scene, static, hr, d, jnp.ones((n, 4)), u4, u_lobe,
                     u_lobe)
    dirs = np.asarray(sr.direction)
    # match the integrator's acceptance: RANDOM and pdf > 0 (GGX VNDF puts
    # ~20% of samples below the horizon with pdf = 0; those lanes are killed,
    # wurblpt.hpp:169-176 equivalent)
    ok = (np.asarray(sr.kind) == ScatterKind.RANDOM) & (np.asarray(sr.pdf) > 0)
    dirs = dirs[ok]

    # hemisphere bins: 4 cos-theta bands x 8 phi sectors (normal = +z)
    def bin_of(v):
        ct = np.clip(v[:, 2], 0.0, 1.0)
        band = np.minimum((ct * 4).astype(int), 3)
        phi = np.arctan2(v[:, 1], v[:, 0])
        sect = np.minimum(((phi + np.pi) / (2 * np.pi) * 8).astype(int), 7)
        return band * 8 + sect

    counts = np.bincount(bin_of(dirs), minlength=32).astype(np.float64)
    freq = counts / counts.sum()

    # expected bin masses: MC-integrate the eval pdf with uniform hemisphere
    # directions (2*pi * mean(pdf) per bin share)
    m = 1 << 17
    z = rng.random(m)
    phi_u = rng.random(m) * 2 * np.pi - np.pi
    s = np.sqrt(np.maximum(1 - z * z, 0))
    udirs = np.stack([s * np.cos(phi_u), s * np.sin(phi_u), z], -1)
    _, pdf_u = bsdf_eval(scene, static,
                         jax.tree_util.tree_map(lambda x: x[:m], hr),
                         d[:m], jnp.asarray(udirs, jnp.float32))
    pdf_u = np.asarray(pdf_u)
    bins_u = bin_of(udirs)
    mass = np.zeros(32)
    np.add.at(mass, bins_u, pdf_u)
    mass = mass / max(mass.sum(), 1e-12)

    sel = mass > 0.01
    assert sel.sum() >= 10
    rel = np.abs(freq[sel] - mass[sel]) / mass[sel]
    assert rel.max() < 0.08, f"worst bin rel err {rel.max():.3f}"
