#!/usr/bin/env python
"""Round-4 A/B: which lever moved (or didn't).

Times jitted full trace_paths / trace_paths_batched per config variant on
the bench scene, reporting ms/sample:
  r3        — round-3 ship: compact (1.3,8,32,64), launch-sorted
  prefix    — same (the prefix compaction fast path is always-on now)
  sortstate — + cfg.sort_state (state permuted, launches unsorted)
  batch8    — + trace_paths_batched, 8 spp, tail-tightened schedule
  batch8s   — batch8 + sort_state

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4d.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths, trace_paths_batched
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def drain(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return out


def timed(name, fn, *args, reps=5, spp=1):
    t0 = time.time()
    drain(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    r = (time.time() - t0) / reps
    print(f"{name:12s} compile={c:6.1f}s run={r * 1e3:8.2f}ms "
          f"({r * 1e3 / spp:6.2f} ms/sample)", flush=True)
    return out


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)
    size = 512
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    base_key = sample_key(jax.random.key(0), 0)

    def rays(k):
        cam_u = stream_uniforms(k, 0, (4, n))
        return generate_rays(
            cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
            cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)

    o1, d1 = rays(jax.random.fold_in(base_key, 0))
    drain(o1)

    cfg_r3 = RenderConfig(width=size, height=size, bounces=8,
                          extra_refraction_iters=0, compact=True,
                          compact_schedule=(1.3, 8, 32, 64))
    cfg_ss = dataclasses.replace(cfg_r3, sort_state=True)
    sched_b = (1.3, 8, 32, 96, 350, 1024, 2048, 2048)
    cfg_b = dataclasses.replace(cfg_r3, compact_schedule=sched_b,
                                wavefront_batch=True)
    cfg_bs = dataclasses.replace(cfg_b, sort_state=True)

    timed("r3", jax.jit(lambda o, d, k: trace_paths(
        arrays, cfg_r3, meta, o, d, k)), o1, d1, base_key, spp=1)
    timed("sortstate", jax.jit(lambda o, d, k: trace_paths(
        arrays, cfg_ss, meta, o, d, k)), o1, d1, base_key, spp=1)

    K = 8
    per = [rays(jax.random.fold_in(base_key, i)) for i in range(K)]
    cat = lambda f: jnp.concatenate([f(o, d) for o, d in per])
    O = V3(cat(lambda o, d: o.x), cat(lambda o, d: o.y),
           cat(lambda o, d: o.z))
    D = V3(cat(lambda o, d: d.x), cat(lambda o, d: d.y),
           cat(lambda o, d: d.z))
    drain(O)
    timed("batch8", jax.jit(lambda o, d, k: trace_paths_batched(
        arrays, cfg_b, meta, o, d, k, n_per=n)), O, D, base_key, spp=K)
    timed("batch8s", jax.jit(lambda o, d, k: trace_paths_batched(
        arrays, cfg_bs, meta, o, d, k, n_per=n)), O, D, base_key, spp=K)
    # batched with the r3 schedule: isolates tail-tightening from merging
    cfg_bm = dataclasses.replace(cfg_r3, wavefront_batch=True,
                                 sort_state=True)
    timed("batch8r3", jax.jit(lambda o, d, k: trace_paths_batched(
        arrays, cfg_bm, meta, o, d, k, n_per=n)), O, D, base_key, spp=K)


if __name__ == "__main__":
    main()
