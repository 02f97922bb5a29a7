#!/usr/bin/env python
"""Benchmark: forward path-tracing throughput in rays/s/chip.

Workload mirrors BASELINE.md's target config: a bunny-scale scene (~80k+
triangles — the mount is missing bunny_big.obj, so a procedurally generated
stand-in of the same scale is used), 8 bounces, 1spp batches, 512x512.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2e9 (the 2 Grays/s/chip target — the reference
publishes no numbers of its own; see BASELINE.md).

The headline value counts ACTIVE-LANE rays only (core/integrator.TraceStats:
primary + live scatter/shadow segments per bounce), per round-2 VERDICT
item 6; the 2N-lanes-per-launch figure is reported in stderr as an upper
bound, alongside a per-bounce occupancy/visits bottleneck table.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    # persistent executable cache: kernel compiles ride a remote helper on
    # the axon tunnel and can take minutes; cache across processes
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("FSPT_JAX_CACHE", "/tmp/fspt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.runtime.renderer import Renderer
    from fspt_tpu.testing import make_bunny_standin_scene

    subdiv = int(os.environ.get("FSPT_BENCH_SUBDIV", "6"))
    size = int(os.environ.get("FSPT_BENCH_SIZE", "512"))
    warmup = int(os.environ.get("FSPT_BENCH_WARMUP", "2"))
    iters = int(os.environ.get("FSPT_BENCH_ITERS", "8"))
    spp = int(os.environ.get("FSPT_BENCH_SPP", "8"))

    t0 = time.time()
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    build_s = time.time() - t0

    # Wavefront-batched step: 8 samples share one path state so tail
    # iterations pool their survivors (trace_paths_batched).  The schedule
    # tracks the measured per-sample occupancy collapse (0.68, 0.10, 0.03,
    # 0.01, ...) x the batch: early divisors match the round-3 tuning,
    # tail divisors tighten ~8x because 8 samples' survivors share each
    # 1024-lane packet (PERF.md: bounces 3-7 ran at ~0% occupancy).
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=spp,
                       compact=True, wavefront_batch=spp > 1,
                       sort_state=True,
                       compact_schedule=(1.45, 9.5, 40, 128, 512,
                                         2048, 2048, 2048))
    r = Renderer(scene, cfg)

    t0 = time.time()
    r.step()  # compile + 1 batch
    compile_s = time.time() - t0

    r.step(warmup)
    r._stats = {"samples": 0, "seconds": 0.0, "rays": 0.0}
    r.step(iters)   # step() drains the dispatch pipeline (scalar fetch)
    s = r.stats

    img = r.hdr_image()
    ok = bool(jnp.isfinite(jnp.asarray(img)).all())

    print(json.dumps({
        "metric": f"rays/s/chip, active lanes (bunny-scale standin, "
                  f"8 bounces, 1spp, {size}x{size})",
        "value": round(s["rays_per_s"], 1),
        "unit": "rays/s",
        "vs_baseline": round(s["rays_per_s"] / 2.0e9, 4),
    }))
    print(f"# triangles={scene.num_triangles} bvh_depth={scene.bvh_depth} "
          f"scene_build={build_s:.1f}s compile={compile_s:.1f}s "
          f"bench={s['seconds']:.2f}s samples={s['samples']} "
          f"ms_per_sample={s['seconds'] / max(s['samples'], 1) * 1e3:.1f} "
          f"honest_rays={s['rays']:.3e} "
          f"lane_rays_upper_bound={s['lane_rays_upper_bound']:.3e} "
          f"finite={ok} device={jax.devices()[0].device_kind}",
          file=sys.stderr)
    m = r.step_metrics()
    occ = " ".join(f"{x:.2f}" for x in m["scatter_occupancy"])
    sha = " ".join(f"{x:.2f}" for x in m["shadow_occupancy"])
    vis = " ".join(f"{x:.0f}" for x in m["visits_per_lane"])
    print(f"# per-bounce scatter occupancy: {occ}", file=sys.stderr)
    print(f"# per-bounce shadow  occupancy: {sha}", file=sys.stderr)
    print(f"# per-bounce packet visits/lane: {vis}", file=sys.stderr)
    print(f"# per-sample rr_lanes={m['rr_lanes']:.0f} "
          f"(RR-dropped lanes; unbiased reweighting) — "
          f"phase breakdown + roofline: PERF.md / scripts/perf_phase.py",
          file=sys.stderr)


if __name__ == "__main__":
    main()
