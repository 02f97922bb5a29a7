#!/usr/bin/env python
"""Round-5: first-compaction divisor sweep on the ship config.

perf_r5f only swept the first divisor over 1.45/1.5/1.55, but the
measured bounce-0 scatter occupancy is ~0.67 at width n/1.5 — mean
actives ~117k vs a 175k-lane width.  The primary hit rate is nearly
deterministic across samples (AA jitter moves it by well under 1%), so
the width can drop toward the actives with little RR risk, shrinking
the DOMINANT launch (bounce-0 traversal, shading, and state sort all
scale with it).  Sweep 1.5 -> 2.2 and report ms/sample + rr_lanes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5j.py
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.config import RenderConfig
from fspt_tpu.runtime.renderer import Renderer
from fspt_tpu.testing import make_bunny_standin_scene


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    for d0 in (1.5, 1.7, 1.9, 2.0, 2.1):
        cfg = RenderConfig(width=512, height=512, bounces=8,
                           extra_refraction_iters=0, batch_spp=8,
                           compact=True, wavefront_batch=True,
                           sort_state=True, intersector="split",
                           nee_env_nearest=True, escape_env_nearest=True,
                           compact_schedule=(d0, 11, 48, 160, 640,
                                             2048, 2048, 2048))
        r = Renderer(scene, cfg)
        t0 = time.time()
        r.step()
        compile_s = time.time() - t0
        r.step(2)
        r._stats = {"samples": 0, "seconds": 0.0, "rays": 0.0}
        r.step(6)
        s = r.stats
        m = r.step_metrics()
        ms = s["seconds"] / max(s["samples"], 1) * 1e3
        print(f"d0={d0:<4} ms/sample={ms:6.1f}  "
              f"rays/s={s['rays_per_s'] / 1e6:5.2f}M  "
              f"rr_lanes={m['rr_lanes']:.0f}  "
              f"occ0={m['scatter_occupancy'][0]:.2f}  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
