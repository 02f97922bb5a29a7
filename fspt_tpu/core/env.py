"""Environment-map lookup and HDRi importance sampling (radiance bins).

Parity with reference tracer.fs:410-434 (envColor/envSample/sampleEnv) and the
host-side bin construction in scene/envmap.py.  One deliberate deviation: the
reference bilinearly filters raw 8-bit RGBE texels *before* decoding
(tracer.fs:410-414 — mathematically wrong across exponent boundaries); we
decode on the host and filter linear radiance, which is both correct and
differentiable w.r.t. the env map.
"""

from __future__ import annotations

import jax.numpy as jnp

M_PI = 3.14159265
M_TAU = 2.0 * M_PI
INV_PI = 1.0 / M_PI


def bilinear_wrap_x(img, u, v):
    """Sample (H, W, C) at continuous uv in [0,1] with REPEAT in u and
    CLAMP_TO_EDGE in v (reference main.js:174-177 texture params).
    Texel centers at (i + 0.5) / N, GL LINEAR filtering."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    x1 = jnp.mod(x0 + 1, w)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def env_uv(direction, theta):
    """Equirect direction -> uv (tracer.fs:416-418):
    u = theta + atan2(z, x) / tau  (wraps),  v = asin(-y)/pi + 0.5."""
    u = theta + jnp.arctan2(direction[..., 2], direction[..., 0]) / M_TAU
    v = jnp.arcsin(jnp.clip(-direction[..., 1], -1.0, 1.0)) * INV_PI + 0.5
    return u, v


def env_radiance(env, direction, theta):
    """(N, 3) radiance for (N, 3) directions."""
    u, v = env_uv(direction, theta)
    return bilinear_wrap_x(env, u, v)


def sample_env_bins(env_bins, n_bins, env_hw, theta, u1, u2, u3):
    """Draw env directions from the radiance bins (tracer.fs:421-434).

    env_bins: (B, 4) f32 [x0, y0, x1, y1] in pixels; n_bins: traced scalar;
    env_hw: static (H, W).  Returns (dir (N, 3), pdf (N,)).
    """
    h, w = env_hw
    nb = n_bins.astype(jnp.float32)
    idx = jnp.clip((nb * u1).astype(jnp.int32), 0, n_bins - 1)
    b = env_bins[idx]                               # (N, 4)
    bw = b[..., 2] - b[..., 0]
    bh = b[..., 3] - b[..., 1]
    u = (-theta) + (bw * u2 + b[..., 0]) / w
    v = (bh * u3 + b[..., 1]) / h
    th = u * M_TAU
    phi = v * M_PI
    sin_phi = jnp.sin(phi)
    direction = jnp.stack([jnp.cos(th) * sin_phi, jnp.cos(phi),
                           jnp.sin(th) * sin_phi], axis=-1)
    nominal = (w * h) / nb
    pdf = nominal / jnp.maximum(bw * bh * M_TAU * M_PI * sin_phi, 1e-12)
    return direction, pdf
