#!/usr/bin/env python
"""Benchmark: forward path-tracing throughput in rays/s/chip.

Workload mirrors BASELINE.md's target config: a bunny-scale scene (~80k+
triangles — the mount is missing bunny_big.obj, so a procedurally generated
stand-in of the same scale is used), 8 bounces, 1spp batches, 512x512.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2e9 (the 2 Grays/s/chip target — the reference
publishes no numbers of its own; see BASELINE.md).
"""

import json
import os
import sys
import time


def count_rays_per_sample(cfg, n_pixels):
    """Rays actually traced per sample: primary + per-iteration batched
    (scatter + shadow) traversal of 2N lanes."""
    return n_pixels * (1 + 2 * cfg.max_iters)


def main():
    import jax
    import jax.numpy as jnp

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.runtime.renderer import Renderer
    from fspt_tpu.testing import make_bunny_standin_scene

    subdiv = int(os.environ.get("FSPT_BENCH_SUBDIV", "6"))
    size = int(os.environ.get("FSPT_BENCH_SIZE", "512"))
    warmup = int(os.environ.get("FSPT_BENCH_WARMUP", "2"))
    iters = int(os.environ.get("FSPT_BENCH_ITERS", "8"))

    t0 = time.time()
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    build_s = time.time() - t0

    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=1)
    r = Renderer(scene, cfg)

    t0 = time.time()
    r.step()  # compile + 1 sample
    compile_s = time.time() - t0

    r.step(warmup)
    t0 = time.time()
    r.step(iters)   # step() drains the dispatch pipeline (scalar fetch)
    dt = time.time() - t0

    n_pixels = cfg.width * cfg.height
    rays = iters * cfg.batch_spp * count_rays_per_sample(cfg, n_pixels)
    rays_per_s = rays / dt

    img = r.hdr_image()
    ok = bool(jnp.isfinite(jnp.asarray(img)).all())

    print(json.dumps({
        "metric": "rays/s/chip (bunny-scale standin, 8 bounces, 1spp, 512x512)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 2.0e9, 4),
    }))
    print(f"# triangles={scene.num_triangles} bvh_depth={scene.bvh_depth} "
          f"scene_build={build_s:.1f}s compile={compile_s:.1f}s "
          f"bench={dt:.2f}s samples={iters} finite={ok} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
