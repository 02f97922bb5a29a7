#!/usr/bin/env python
"""Round-5: batch size + schedule micro-tune on the shipping config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site:scripts python scripts/perf_r5f.py
"""
import dataclasses

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
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    base_key = sample_key(jax.random.key(0), 0)
    ship = RenderConfig(width=size, height=size, bounces=8,
                        extra_refraction_iters=0, batch_spp=8,
                        compact=True, wavefront_batch=True, sort_state=True,
                        intersector="split", nee_env_nearest=True,
                        escape_env_nearest=True,
                        compact_schedule=(1.45, 9.5, 40, 128, 512,
                                          2048, 2048, 2048))
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)

    def rays_for(K):
        def rays(k):
            cam_u = stream_uniforms(k, 0, (4, n))
            return generate_rays(
                cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
                cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)
        per = [rays(jax.random.fold_in(base_key, i)) for i in range(K)]
        cat = lambda f: jnp.concatenate([f(o, d) for o, d in per])
        return drain((V3(cat(lambda o, d: o.x), cat(lambda o, d: o.y),
                         cat(lambda o, d: o.z)),
                      V3(cat(lambda o, d: d.x), cat(lambda o, d: d.y),
                         cat(lambda o, d: d.z))))

    variants = [
        ("ship K=8", 8, {}),
        ("K=16", 16, {}),
        ("sched tight", 8, dict(compact_schedule=(1.5, 11, 48, 160, 640,
                                                  2048, 2048, 2048))),
        ("sched tight2", 8, dict(compact_schedule=(1.55, 12, 56, 192, 768,
                                                   3072, 3072, 3072))),
    ]
    for name, K, kw in variants:
        cfg = dataclasses.replace(ship, batch_spp=K, **kw)
        O, D = rays_for(K)
        fn = jax.jit(lambda o, d, k, c=cfg: trace_paths_batched(
            arrays, c, meta, o, d, k, n_per=n, return_stats=True))
        r, st = fn(O, D, base_key)
        drain(r)
        t = timed(lambda o, d, k: fn(o, d, k), O, D, base_key,
                  reps=5) / K * 1e3
        print(f"{name:14s} {t:7.2f} ms/sample  rr={float(st.rr_lanes)/K:.0f}"
              f"/sample  mean={float(np.asarray(r.x).mean()):.5f}",
              flush=True)


if __name__ == "__main__":
    main()
