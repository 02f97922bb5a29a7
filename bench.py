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
    # schedule: round-5 re-tune under the cheaper traversal (perf_r5f.py:
    # (1.5, 11, ...) = 89.5 vs 92.1 ms/sample at rr ~1.5% of segments;
    # tighter still is within noise at 2.6% RR)
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=spp,
                       compact=True, wavefront_batch=spp > 1,
                       sort_state=True, intersector="split",
                       nee_env_nearest=True, escape_env_nearest=True,
                       compact_schedule=(1.5, 11, 48, 160, 640,
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
    vis = " ".join(f"{x:.2f}" for x in m["visits_per_lane"])
    print(f"# per-bounce scatter occupancy: {occ}", file=sys.stderr)
    print(f"# per-bounce shadow  occupancy: {sha}", file=sys.stderr)
    print(f"# per-bounce packet visits/lane: {vis}", file=sys.stderr)

    # ---- hardware-anchored roofline (round-4 VERDICT item 4) -----------
    # walk-visits: every lane of a 128-ray walk reports the walk's shared
    # fetch count, so total row fetches = sum(visits)/128; each packed row
    # is 128 f32 = 512 B.  Shading pays ~6 row gathers per live lane per
    # iteration (attr 43 + 2x24 packed material + bins 4 + NEE env 6 +
    # escape env 6 columns, core/integrator).  Program-steps advance 8
    # walks at once; the pure-VPU floor for a fused slab+MT substep was
    # measured at ~150 ns (PERF.md roofline), which bounds any refinement
    # of this traversal decomposition.
    n = size * size
    # step_metrics() replays ONE unbatched sample: all figures per sample
    visits_lane = sum(m["visits_per_lane"]) * n
    row_fetches = visits_lane / 128.0            # one 512 B row per visit
    trav_bytes = row_fetches * 512.0
    live = sum(m["scatter_occupancy"]) * n
    shade_bytes = live * (43 + 48 + 4 + 6 + 6) * 4.0
    rays_per_sample = m["rays"]
    bytes_per_ray = (trav_bytes + shade_bytes) / max(rays_per_sample, 1.0)
    prog_steps = row_fetches / 8.0
    floor_ms = prog_steps * 150e-9 * 1e3
    ms_sample = s["seconds"] / max(s["samples"], 1) * 1e3
    print(f"# roofline: {bytes_per_ray:.0f} HBM bytes/honest-ray; "
          f"{prog_steps:.0f} serial program-steps/sample => "
          f"{floor_ms:.1f} ms at the 150 ns VPU-floor "
          f"({floor_ms / ms_sample * 100:.0f}% of the "
          f"{ms_sample:.1f} ms measured sample); "
          f"ceiling {rays_per_sample / max(floor_ms, 1e-9) * 1e3 / 1e6:.0f}"
          f" Mrays/s at current visit counts", file=sys.stderr)
    print(f"# per-sample rr_lanes={m['rr_lanes']:.0f} "
          f"(RR-dropped lanes; unbiased reweighting) — "
          f"phase breakdown + roofline: PERF.md / scripts/perf_phase.py",
          file=sys.stderr)


if __name__ == "__main__":
    main()
