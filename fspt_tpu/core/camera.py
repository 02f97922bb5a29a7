"""Primary-ray generation: pinhole basis + anti-alias jitter + thin-lens DOF.

Parity with reference shader/camera.fs: basis from view dir x world-up
(:39-41), screen point at unit distance scaled by fovScale (:21-24), AA jitter
uniform disk of radius sqrt(2) px (:26-30), thin-lens DOF with
lens_x = 1 - 1/focal_depth (:32-35,:44-45; encoding main.js:74).

Image convention: row 0 = top of image; GL's bottom-up fragment coords are
absorbed into the v flip here.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fspt_tpu.core.geometry import normalize

M_PI = 3.14159265
M_TAU = 2.0 * M_PI


def camera_basis(direction):
    """basisX/basisY from view dir and world-up (camera.fs:39-41)."""
    i = jnp.asarray(direction, jnp.float32)
    bx = normalize(jnp.cross(i, jnp.array([0.0, 1.0, 0.0])))
    by = normalize(jnp.cross(bx, i))
    return bx, by


def generate_rays(position, direction, fov_scale, focal_depth, aperture,
                  resolution: Tuple[int, int], uniforms, pixel_idx=None):
    """Primary rays for every pixel.

    resolution: (width, height) static.  uniforms: (N, 4) in [0,1) — AA angle,
    AA radius, DOF angle, DOF radius draws.  Returns (origin (N,3), dir (N,3))
    with N = width * height in row-major (row 0 = image top).

    pixel_idx: optional (N,) i32 row-major pixel indices — lets a sharded
    caller generate only its own tile's rays (N then equals len(pixel_idx)).
    """
    width, height = resolution
    p = jnp.asarray(position, jnp.float32)
    i = jnp.asarray(direction, jnp.float32)
    bx, by = camera_basis(i)

    if pixel_idx is None:
        pixel_idx = jnp.arange(width * height, dtype=jnp.int32)
    px = (pixel_idx % width).astype(jnp.float32)
    py = (pixel_idx // width).astype(jnp.float32)
    uvx = (px + 0.5) / width * 2.0 - 1.0
    uvy = 1.0 - (py + 0.5) / height * 2.0

    aspect = width / height
    screen = (uvx[:, None] * bx * (fov_scale * aspect)
              + uvy[:, None] * by * fov_scale + i + p)

    theta_aa = uniforms[:, 0] * M_TAU
    r_aa = jnp.sqrt(uniforms[:, 1]) * 1.414
    aa = (r_aa * jnp.cos(theta_aa))[:, None] * bx / width \
        + (r_aa * jnp.sin(theta_aa))[:, None] * by / height
    aa = aa * fov_scale

    theta_dof = uniforms[:, 2] * M_TAU
    r_dof = jnp.sqrt(uniforms[:, 3]) * aperture
    dof = (jnp.cos(theta_dof) * r_dof)[:, None] * bx \
        + (jnp.sin(theta_dof) * r_dof)[:, None] * by

    lens_x = 1.0 - 1.0 / focal_depth
    origin = p + dof
    d = normalize(screen + aa + dof * lens_x - origin)
    return origin, d
