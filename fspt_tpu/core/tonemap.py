"""Post-process chain: firefly filter, exposure, ACES fitted tonemap,
saturation, gamma — a small jittable (and differentiable) pure function.

Parity with reference shader/draw.fs: 5x5 neighborhood sigma-clamp firefly
filter (:50-80), exposure multiply (:85-87), Stephen Hill's ACES fit
(:19-48), saturation mix against luma (:90), gamma 1/2.2 (:91).

Deviation: the reference's texelFetch at image borders reads out-of-bounds
(undefined in GLSL); we clamp to edge.
"""

from __future__ import annotations

import jax.numpy as jnp

LUMA = jnp.array([0.2126, 0.7152, 0.0722])

# GLSL mat3 is column-major and the shader computes v * M (row-vector), so the
# effective row-major matrices are exactly these (draw.fs:19-30).
ACES_INPUT = jnp.array([
    [0.59719, 0.35458, 0.04823],
    [0.07600, 0.90834, 0.01566],
    [0.02840, 0.13383, 0.83777],
])
ACES_OUTPUT = jnp.array([
    [1.60475, -0.53108, -0.07367],
    [-0.10208, 1.10813, -0.00605],
    [-0.00327, -0.07276, 1.07602],
])


def rrt_and_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color):
    """(..., 3) -> (..., 3), clamped to [0, 1] (draw.fs:39-48)."""
    color = color @ ACES_INPUT.T
    color = rrt_and_odt_fit(color)
    color = color @ ACES_OUTPUT.T
    return jnp.clip(color, 0.0, 1.0)


def filter_fireflies(img, max_sigma):
    """5x5 neighborhood luma sigma-clamp (draw.fs:50-80).

    img: (H, W, 3) HDR. If the center luma deviates from the neighborhood mean
    (center excluded) by more than max_sigma * sigma, rescale to the mean.
    """
    k = 5
    half = k // 2
    luma = img @ LUMA
    padded = jnp.pad(luma, half, mode="edge")
    h, w = luma.shape
    stack = jnp.stack([
        padded[dy:dy + h, dx:dx + w]
        for dy in range(k) for dx in range(k)
        if not (dy == half and dx == half)
    ])                                              # (24, H, W)
    n = k * k - 1
    mean = stack.sum(axis=0) / n
    var = (stack ** 2).sum(axis=0) / n - mean ** 2
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    bad = jnp.abs(luma - mean) > max_sigma * sigma
    scale = jnp.where(bad, mean / jnp.maximum(luma, 1e-12), 1.0)
    return img * scale[..., None]


def postprocess(img, exposure=1.0, saturation=1.0, denoise=False,
                max_sigma=2.0, gamma=2.2):
    """(H, W, 3) HDR accumulated radiance -> (H, W, 3) display [0,1]
    (draw.fs:82-93)."""
    if denoise:
        img = filter_fireflies(img, max_sigma)
    img = img * exposure
    mapped = aces_fitted(img)
    l = (mapped @ LUMA)[..., None]
    mapped = l + (mapped - l) * saturation
    return jnp.power(jnp.clip(mapped, 0.0, 1.0), 1.0 / gamma)
