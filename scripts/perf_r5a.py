#!/usr/bin/env python
"""Round-5 A/B #1: BVH shape sweep under the SHIPPING bench config.

packing.py's docstring has claimed since round 3 that 16-wide nodes cut
walk-visits ~35% (the per-visit cost is fetch/serial-bound, so testing 16
children costs the same one-row fetch as 8), yet no bench config ever ran
width 16 — and leaf sizes were only swept DOWN (6, 4 — both lose, PERF.md)
even though one 128-lane leaf row fits up to 14 triangles.  Bigger leaves
chop the deepest tree levels, exactly where incoherent 128-ray walk unions
explode.

Times the exact bench workload (trace_paths_batched, 8 spp, shipping
schedule + sort_state) per scene variant, plus per-iteration visit stats.

Usage: PYTHONPATH=/root/repo python scripts/perf_r5a.py
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
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=K,
                       compact=True, wavefront_batch=True, sort_state=True,
                       compact_schedule=(1.45, 9.5, 40, 128, 512,
                                         2048, 2048, 2048))

    variants = [
        ("w8_l8  (ship)", dict(bvh_width=8, leaf_size=8)),
        ("w16_l8", dict(bvh_width=16, leaf_size=8)),
        ("w8_l14", dict(bvh_width=8, leaf_size=14)),
        ("w16_l14", dict(bvh_width=16, leaf_size=14)),
        ("w16_l12", dict(bvh_width=16, leaf_size=12)),
    ]

    rays_cached = None
    for name, kw in variants:
        scene = make_bunny_standin_scene(subdivisions=6, **kw)
        arrays = scene.device_arrays()
        meta = scene.meta
        cam = CameraState.from_config(scene.camera)
        if rays_cached is None:
            def rays(k):
                cam_u = stream_uniforms(k, 0, (4, n))
                return generate_rays(
                    cam.position, cam.direction, cam.fov_scale,
                    cam.focal_depth, cam.aperture, (size, size), cam_u,
                    pixel_idx=pixel_idx)
            per = [rays(jax.random.fold_in(base_key, i)) for i in range(K)]
            cat = lambda f: jnp.concatenate([f(o, d) for o, d in per])
            O = V3(cat(lambda o, d: o.x), cat(lambda o, d: o.y),
                   cat(lambda o, d: o.z))
            D = V3(cat(lambda o, d: d.x), cat(lambda o, d: d.y),
                   cat(lambda o, d: d.z))
            drain(O)
            rays_cached = (O, D)
        O, D = rays_cached
        fn = jax.jit(lambda o, d, k, a=arrays, m=meta: trace_paths_batched(
            a, cfg, m, o, d, k, n_per=n, return_stats=True))
        t0 = time.time()
        r, st = fn(O, D, base_key)
        drain(r)
        comp = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = fn(O, D, base_key)
        drain(out)
        ms = (time.time() - t0) / reps / K * 1e3
        vis = np.asarray(st.visits)
        nodes_kb = arrays.pk_nodes.shape[0] * 128 * 4 / 1024
        leaves_kb = arrays.pk_leaves.shape[0] * 128 * 4 / 1024
        mean = float(np.asarray(r.x).mean())
        print(f"{name:14s} depth={meta.pk_stack_depth // kw['bvh_width'] - 2}"
              f" nodes={nodes_kb:7.0f}KiB leaves={leaves_kb:7.0f}KiB "
              f"compile={comp:6.1f}s  {ms:7.2f} ms/sample  "
              f"visits_it0={vis[0] / (K * n):5.1f}/lane mean={mean:.5f}",
              flush=True)


if __name__ == "__main__":
    main()
