"""Active-lane compaction (core/integrator._compact) correctness.

The compaction pipeline statically shrinks the path state between bounce
iterations, Russian-roulette-reweighting when live lanes exceed the next
width.  Three contracts:

1. A non-shrinking schedule is bit-exact vs the uncompacted estimator
   (pure state reshuffle; all per-lane RNG is keyed by global lane id).
2. A shrinking schedule that stays above the live-lane count is still
   sample-exact (selection keeps every active lane with weight 1).
3. A schedule tight enough to force RR is *unbiased*: the multi-sample
   mean matches the uncompacted estimator within MC tolerance, and every
   survivor's throughput reweighting keeps radiance finite.

(The reference has no analog — a WebGL fragment shader retires dead pixels
for free; on TPU static shapes make this an explicit, testable subsystem.
Reference bounce loop: /root/reference/shader/tracer.fs:436-518.)
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.testing import make_test_scene

SIZE = 24
N = SIZE * SIZE


def _rays(scene, s_idx):
    cam = scene.camera
    key = sample_key(jax.random.key(0), s_idx)
    cam_u = stream_uniforms(key, 0, (4, N))
    origin, direction = generate_rays(
        jnp.asarray(cam.position), jnp.asarray(cam.direction),
        cam.fov_scale, cam.focal_depth, cam.aperture,
        (SIZE, SIZE), cam_u)
    return origin, direction, key


def _img(r):
    return np.stack([np.asarray(r.x), np.asarray(r.y), np.asarray(r.z)])


def test_compact_noshrink_exact():
    scene = make_test_scene(subdivisions=1, textured=True)
    arrays, meta = scene.device_arrays(), scene.meta
    o, d, key = _rays(scene, 0)
    cfg0 = RenderConfig(width=SIZE, height=SIZE, bounces=3, compact=False)
    cfg1 = dataclasses.replace(cfg0, compact=True,
                               compact_schedule=(1, 1, 1))
    a0 = _img(trace_paths(arrays, cfg0, meta, o, d, key))
    a1 = _img(trace_paths(arrays, cfg1, meta, o, d, key))
    np.testing.assert_allclose(a0, a1, atol=1e-6)


def test_compact_underbudget_exact():
    scene = make_test_scene(subdivisions=1, textured=True)
    arrays, meta = scene.device_arrays(), scene.meta
    o, d, key = _rays(scene, 1)
    cfg0 = RenderConfig(width=SIZE, height=SIZE, bounces=3, compact=False)
    # generous schedule: RR never fires on this scene, so the compacted
    # estimator must agree lane-for-lane (fp association differences only)
    cfg1 = dataclasses.replace(cfg0, compact=True,
                               compact_schedule=(1, 1, 2))
    a0 = _img(trace_paths(arrays, cfg0, meta, o, d, key))
    a1 = _img(trace_paths(arrays, cfg1, meta, o, d, key))
    assert np.isfinite(a1).all()
    # scatter-add accumulation reassociates fp adds; exactness up to ulps
    np.testing.assert_allclose(a0, a1, atol=1e-5)


def test_compact_rr_unbiased():
    scene = make_test_scene(subdivisions=1, textured=True)
    arrays, meta = scene.device_arrays(), scene.meta
    cfg0 = RenderConfig(width=SIZE, height=SIZE, bounces=3, compact=False)
    # brutal schedule: 1/8 width from the second iteration on — forces RR
    cfg1 = dataclasses.replace(cfg0, compact=True,
                               compact_schedule=(1, 8, 8))
    tp0 = jax.jit(lambda o, d, k: trace_paths(arrays, cfg0, meta, o, d, k))
    tp1 = jax.jit(lambda o, d, k: trace_paths(arrays, cfg1, meta, o, d, k))
    m0 = np.zeros(3)
    m1 = np.zeros(3)
    S = 32
    for s in range(S):
        o, d, key = _rays(scene, s)
        a0 = _img(tp0(o, d, key))
        a1 = _img(tp1(o, d, key))
        assert np.isfinite(a1).all()
        m0 += a0.mean(axis=(1,))
        m1 += a1.mean(axis=(1,))
    m0 /= S
    m1 /= S
    # later-bounce contributions are a small fraction of total radiance;
    # 32 samples x 576 lanes of RR noise on them sits well under 5%
    np.testing.assert_allclose(m1, m0, rtol=0.05)


def test_packed_textures_parity():
    scene = make_test_scene(subdivisions=1, textured=True)
    arrays, meta = scene.device_arrays(), scene.meta
    o, d, key = _rays(scene, 2)
    cfgA = RenderConfig(width=SIZE, height=SIZE, bounces=3,
                        packed_textures=True)
    cfgB = dataclasses.replace(cfgA, packed_textures=False)
    aA = _img(trace_paths(arrays, cfgA, meta, o, d, key))
    aB = _img(trace_paths(arrays, cfgB, meta, o, d, key))
    # same bilinear math, different fp association (packed rows fold the
    # x-lerp before the y-lerp)
    np.testing.assert_allclose(aA, aB, atol=1e-4)
