"""Scaling-efficiency meter for the sharded render step (BASELINE.md's
"≥85% rays/s scaling efficiency" acceptance criterion; round-2 VERDICT
item 3 — the reference has no distribution at all, SURVEY §5, so this
component is new to the rebuild).

Two numbers per mesh size:

* **load-balance efficiency** — total honest rays / (n_dev x max per-device
  rays), from the per-shard TraceStats ray counts the sharded step returns.
  The forward render has NO collectives (tiles are disjoint; the only
  reduction is the final host-side image assembly), so on real hardware
  wall-clock scaling efficiency IS load balance up to launch jitter: a
  device finishing early idles until the host issues the next step.
  Deterministic, measurable exactly on any mesh — including the CI CPU
  mesh, where xla_force_host_platform_device_count=8 on a 2-core VM makes
  wall-clock measurements physically meaningless.
* **wall-clock rays/s** — informational; trustworthy only when devices are
  real chips (1 chip here; a pod via jax.distributed.initialize).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.dist import (make_mesh, make_sharded_sample_step,
                                    shard_accum)
from fspt_tpu.runtime.renderer import CameraState


@dataclasses.dataclass
class ScalePoint:
    n_devices: int
    rays: float               # honest rays traced per step (all devices)
    max_shard_rays: float     # busiest device's rays
    balance_efficiency: float  # rays / (n_devices * max_shard_rays)
    seconds: float            # wall-clock per step (informational)
    rays_per_s: float


@dataclasses.dataclass
class ScalingReport:
    points: List[ScalePoint]

    @property
    def efficiency(self) -> float:
        """Load-balance efficiency at the largest measured mesh."""
        return self.points[-1].balance_efficiency

    def table(self) -> str:
        lines = ["devices  rays/step  balance-eff  wall-ms  Mrays/s"]
        for p in self.points:
            lines.append(f"{p.n_devices:7d}  {p.rays:9.0f}  "
                         f"{p.balance_efficiency:11.3f}  "
                         f"{p.seconds * 1e3:7.1f}  "
                         f"{p.rays_per_s / 1e6:7.2f}")
        return "\n".join(lines)


def measure_scaling(scene, cfg: RenderConfig,
                    device_counts: Sequence[int] = (1, 2, 4, 8),
                    steps: int = 2, warmup: int = 1) -> ScalingReport:
    """Run the sharded sample step on meshes of each size and report
    per-device ray counts, balance efficiency, and wall-clock."""
    arrays = scene.device_arrays()
    cam = CameraState.from_config(scene.camera)
    n = cfg.width * cfg.height
    avail = len(jax.devices())
    points = []
    for n_dev in device_counts:
        if n_dev > avail or n % n_dev:
            continue
        mesh = make_mesh(n_dev)
        step = make_sharded_sample_step(mesh, cfg, scene.meta)
        accum = shard_accum(jnp.zeros((3, n), jnp.float32), mesh)
        count = jnp.zeros(())
        key = jax.random.key(cfg.seed)
        shard_rays = None
        for i in range(warmup):
            accum, count, shard_rays = step(arrays, cam, accum, count,
                                            key, i)
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for i in range(warmup, warmup + steps):
            accum, count, shard_rays = step(arrays, cam, accum, count,
                                            key, i)
        rays_per_shard = np.asarray(jax.device_get(shard_rays))
        dt = (time.perf_counter() - t0) / steps
        total = float(rays_per_shard.sum())
        mx = float(rays_per_shard.max())
        points.append(ScalePoint(
            n_devices=n_dev, rays=total, max_shard_rays=mx,
            balance_efficiency=total / (n_dev * mx) if mx else 0.0,
            seconds=dt, rays_per_s=total / dt))
    return ScalingReport(points=points)
