"""UE4-style microfacet BRDF: GGX/GTR2 + Smith G + Schlick Fresnel, metallic
workflow, plus cosine-weighted Lambert — sampling, eval, and pdfs.

Parity with reference tracer.fs:205-298 (gtr2, smithG, gtr2Pdf, lambertPdf,
schlick with total internal reflection, sampleMicrofacet, sampleLambert,
evalSpecular, evalLambert, cosineSampleHemisphere) and the power-heuristic
misWeights (tracer.fs:194-203).

All functions are elementwise over (..., ) ray batches; random numbers are
passed in explicitly (counter-based keys live in the integrator).
"""

from __future__ import annotations

import jax.numpy as jnp

from fspt_tpu.core.geometry import dot

M_PI = 3.14159265
M_TAU = 2.0 * M_PI
INV_PI = 1.0 / M_PI


def onb(normal):
    """Orthonormal basis about `normal` — up-vector trick matching
    tracer.fs:259-261/275-277: up = |n.z| < 0.999 ? z : x."""
    up = jnp.where(jnp.abs(normal[..., 2:3]) < 0.999,
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), normal.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape))
    tangent = jnp.cross(up, normal)
    tangent = tangent * jax_rnorm(tangent)
    bitangent = jnp.cross(normal, tangent)
    return tangent, bitangent


def jax_rnorm(v, eps=1e-20):
    return jnp.reciprocal(jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), eps))


def gtr2(ndh, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndh * ndh
    return a2 / (M_PI * t * t)


def smith_g(ndv, alpha_g):
    a = alpha_g * alpha_g
    b = ndv * ndv
    return 1.0 / (ndv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def gtr2_pdf(incident, normal, roughness, bsdf_dir):
    """pdf of the reflected direction under GGX half-vector sampling
    (tracer.fs:227-233)."""
    alpha = jnp.maximum(0.001, roughness)
    half = bsdf_dir + incident
    half = half * jax_rnorm(half)
    cos_theta = jnp.abs(dot(half, normal))
    pdf_h = gtr2(cos_theta, alpha) * cos_theta
    return pdf_h / jnp.maximum(4.0 * jnp.abs(dot(bsdf_dir, half)), 1e-12)


def lambert_pdf(normal, bsdf_dir):
    return jnp.abs(dot(bsdf_dir, normal)) * INV_PI


def schlick(incident, normal, n1, n2):
    """Fresnel with total internal reflection (tracer.fs:239-254).
    n1 = medium of incident ray, n2 = other side."""
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    cos_theta = dot(normal, incident)
    n = n1 / n2
    sin_theta2 = n * n * (1.0 - cos_theta * cos_theta)
    tir = (n1 > n2) & (sin_theta2 > 1.0)
    cos_theta = jnp.where(n1 > n2,
                          jnp.sqrt(jnp.maximum(1.0 - sin_theta2, 0.0)),
                          cos_theta)
    x = 1.0 - cos_theta
    f = r0 + (1.0 - r0) * x ** 5
    return jnp.where(tir, 1.0, f)


def cosine_sample_hemisphere(u1, u2):
    """(..., 3) local-frame direction (tracer.fs:205-213)."""
    r = jnp.sqrt(u1)
    phi = M_TAU * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def sample_microfacet(normal, roughness, u1, u2):
    """GGX half-vector sample about `normal` (tracer.fs:256-270)."""
    tangent, bitangent = onb(normal)
    a = jnp.maximum(0.001, roughness)
    phi = u1 * M_TAU
    cos_theta = jnp.sqrt((1.0 - u2) / (1.0 + (a * a - 1.0) * u2))
    sin_theta = jnp.clip(jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0)), 0.0, 1.0)
    h = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                   cos_theta], axis=-1)
    return (tangent * h[..., 0:1] + bitangent * h[..., 1:2]
            + normal * h[..., 2:3])


def sample_lambert(normal, u1, u2):
    """Cosine-weighted hemisphere about `normal` (tracer.fs:272-280)."""
    tangent, bitangent = onb(normal)
    d = cosine_sample_hemisphere(u1, u2)
    return (tangent * d[..., 0:1] + bitangent * d[..., 1:2]
            + normal * d[..., 2:3])


def eval_specular(incident, normal, diffuse_color, metallic, roughness,
                  bsdf_dir):
    """Gs * Fs * Ds (tracer.fs:282-294). Returns (..., 3)."""
    ndl = dot(normal, bsdf_dir)
    ndv = dot(normal, incident)
    h = bsdf_dir + incident
    h = h * jax_rnorm(h)
    ndh = dot(normal, h)
    a = jnp.maximum(0.001, roughness)
    ds = gtr2(ndh, a)
    fs = (1.0 - metallic[..., None]) + diffuse_color * metallic[..., None]
    roughg = (roughness * 0.5 + 0.5) ** 2
    gs = smith_g(ndl, roughg) * smith_g(ndv, roughg)
    return (gs * ds)[..., None] * fs


def eval_lambert(diffuse_color):
    return diffuse_color * INV_PI


def mis_weights(a, b, eps: float = 1e-6):
    """Power heuristic a^2/(a^2+b^2) (tracer.fs:194-203). Returns (wa, wb);
    degenerate pdfs give (1, 0)."""
    a2 = a * a
    b2 = b * b
    denom = a2 + b2
    ok = (a > eps) & (b > eps)
    wa = jnp.where(ok, a2 / jnp.where(ok, denom, 1.0), 1.0)
    wb = jnp.where(ok, b2 / jnp.where(ok, denom, 1.0), 0.0)
    return wa, wb


def reflect(incident_neg, n):
    """GLSL reflect(I, N) = I - 2 dot(N, I) N."""
    return incident_neg - 2.0 * dot(n, incident_neg)[..., None] * n


def refract(incident_neg, n, eta):
    """GLSL refract(I, N, eta); returns 0-vector on TIR (never selected —
    TIR forces the specular branch via schlick == 1, tracer.fs:487)."""
    ndi = dot(n, incident_neg)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    tir = k < 0.0
    out = (eta[..., None] * incident_neg
           - (eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n)
    return jnp.where(tir[..., None], 0.0, out)
