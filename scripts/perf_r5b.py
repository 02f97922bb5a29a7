#!/usr/bin/env python
"""Round-5 A/B #2: shading-gather fusion (PERF.md round-5 lever 1).

Per shading iteration the estimator pays ~8 row gathers/lane; 4 are env
lookups (bilinear NEE radiance: 2, bilinear scatter-escape radiance: 2).
cfg.nee_env_nearest fuses the NEE radiance into the bin draw (1 gather,
no equirect inverse); cfg.escape_env_nearest makes escapes nearest-texel
(1 gather).  Times the exact bench workload per flag combination.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5b.py
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
from fspt_tpu.core.integrator import trace_paths_batched
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def drain(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return out


def main():
    size = 512
    n = size * size
    K = 8
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    base_key = sample_key(jax.random.key(0), 0)
    ship = RenderConfig(width=size, height=size, bounces=8,
                        extra_refraction_iters=0, batch_spp=K,
                        compact=True, wavefront_batch=True, sort_state=True,
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

    variants = [
        ("ship", {}),
        ("split", dict(intersector="split")),
        ("split+both", dict(intersector="split", nee_env_nearest=True,
                            escape_env_nearest=True)),
    ]
    for name, kw in variants:
        cfg = dataclasses.replace(ship, **kw)
        fn = jax.jit(lambda o, d, k, c=cfg: trace_paths_batched(
            arrays, c, meta, o, d, k, n_per=n))
        t0 = time.time()
        r = drain(fn(O, D, base_key))
        comp = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = fn(O, D, base_key)
        drain(out)
        ms = (time.time() - t0) / reps / K * 1e3
        mean = float(np.asarray(r.x).mean())
        print(f"{name:12s} compile={comp:6.1f}s  {ms:7.2f} ms/sample  "
              f"mean={mean:.5f}", flush=True)


if __name__ == "__main__":
    main()
