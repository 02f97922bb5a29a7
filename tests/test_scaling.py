"""Scaling-efficiency meter tests (BASELINE.md ≥85% criterion; round-2
VERDICT item 3).

The CI box forces 8 virtual CPU devices onto 2 physical cores, so
wall-clock scaling cannot be asserted here; the meter's deterministic
load-balance efficiency — which is what wall-clock efficiency reduces to on
real chips, since the forward pass has no collectives — is asserted
instead (see parallel/scaling.py docstring)."""

import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.scaling import measure_scaling
from fspt_tpu.runtime.renderer import Renderer


def test_scaling_efficiency_meets_target(small_scene):
    cfg = RenderConfig(width=16, height=16, bounces=2,
                       extra_refraction_iters=1, batch_spp=1, seed=0)
    report = measure_scaling(small_scene, cfg, device_counts=(1, 2, 4, 8),
                             steps=1, warmup=1)
    assert [p.n_devices for p in report.points] == [1, 2, 4, 8]
    # 1 device is trivially balanced
    assert report.points[0].balance_efficiency == 1.0
    # ray accounting must be mesh-invariant: same total honest rays
    totals = [p.rays for p in report.points]
    np.testing.assert_allclose(totals, totals[0], rtol=1e-6)
    # the acceptance target, measured on the 8-way mesh
    assert report.efficiency >= 0.85, report.table()


def test_shard_ray_counts_match_single_device(small_scene):
    """The sharded per-shard ray counts must sum to the single-device
    renderer's honest count — the meter measures the same work."""
    cfg = RenderConfig(width=16, height=16, bounces=2,
                       extra_refraction_iters=1, batch_spp=1, seed=0)
    report = measure_scaling(small_scene, cfg, device_counts=(8,),
                             steps=1, warmup=0)
    r = Renderer(small_scene, cfg)
    r.step()
    np.testing.assert_allclose(report.points[0].rays * 1,  # 1 step
                               r.stats["rays"], rtol=1e-6)
