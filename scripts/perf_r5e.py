#!/usr/bin/env python
"""Round-5: where do the 92 ms/sample go now? (post split+nearest-env)

Bounce-depth truncation on the production batched step + standalone
timings of the per-iteration machinery (state sort, compaction) at the
production widths, to rank the remaining levers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site:scripts python scripts/perf_r5e.py
"""
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from r5common import drain, timed

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths_batched
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def main():
    size = 512
    n = size * size
    K = 8
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    base_key = sample_key(jax.random.key(0), 0)
    ship = RenderConfig(width=size, height=size, bounces=8,
                        extra_refraction_iters=0, batch_spp=K,
                        compact=True, wavefront_batch=True, sort_state=True,
                        intersector="split", nee_env_nearest=True,
                        escape_env_nearest=True,
                        compact_schedule=(1.45, 9.5, 40, 128, 512,
                                          2048, 2048, 2048))
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)

    def rays(k):
        cam_u = stream_uniforms(k, 0, (4, n))
        return generate_rays(
            cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
            cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)

    per = [rays(jax.random.fold_in(base_key, i)) for i in range(K)]
    cat = lambda f: jnp.concatenate([f(o, d) for o, d in per])
    O = V3(cat(lambda o, d: o.x), cat(lambda o, d: o.y),
           cat(lambda o, d: o.z))
    D = V3(cat(lambda o, d: d.x), cat(lambda o, d: d.y),
           cat(lambda o, d: d.z))
    drain(O)

    prev = None
    for b in (1, 2, 3, 4, 8):
        cfg = dataclasses.replace(ship, bounces=b)
        fn = jax.jit(lambda o, d, k, c=cfg: trace_paths_batched(
            arrays, c, meta, o, d, k, n_per=n))
        t = timed(fn, O, D, base_key, reps=5) / K * 1e3
        marg = "" if prev is None else f" (+{t - prev:5.2f})"
        print(f"bounces={b}:  {t:7.2f} ms/sample{marg}", flush=True)
        prev = t

    # sort_state off (isolates the per-iteration state permutation)
    for name, kw in (("no sort_state", dict(sort_state=False)),
                     ("no nee/esc fusion", dict(nee_env_nearest=False,
                                                escape_env_nearest=False)),
                     ("v3 walk", dict(intersector="walk")),
                     ("split_shadow", dict(split_shadow=True)),
                     ("leaf14-scene", {}),):
        if name == "leaf14-scene":
            sc = make_bunny_standin_scene(subdivisions=6, leaf_size=14)
            ar, mt = sc.device_arrays(), sc.meta
            cfg = ship
        else:
            ar, mt = arrays, meta
            cfg = dataclasses.replace(ship, **kw)
        fn = jax.jit(lambda o, d, k, c=cfg, a=ar, m=mt: trace_paths_batched(
            a, c, m, o, d, k, n_per=n))
        t = timed(fn, O, D, base_key, reps=5) / K * 1e3
        print(f"{name:20s} {t:7.2f} ms/sample", flush=True)


if __name__ == "__main__":
    main()
