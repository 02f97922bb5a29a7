#!/usr/bin/env python
"""Round-2 profiling: decompose the sample step into traversal / sort /
shading costs on the real device, with per-piece compile times.

Usage: python scripts/profile_r2.py [subdiv]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths, sorted_intersect, intersect
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def timed(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_s = (time.time() - t0) / reps
    print(f"{name:40s} compile={compile_s:7.1f}s  run={run_s * 1e3:9.2f}ms")
    return out, run_s


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    size = 512
    t0 = time.time()
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    print(f"scene build: {time.time() - t0:.1f}s  tris={scene.num_triangles}")
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=1)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = sample_key(jax.random.key(0), 0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(cam.position, cam.direction,
                                      cam.fov_scale, cam.focal_depth,
                                      cam.aperture, (size, size), cam_u,
                                      pixel_idx=pixel_idx)
    origin = jax.block_until_ready(origin)

    # 1. primary (coherent) traversal
    trav = jax.jit(lambda o, d: intersect(arrays, cfg, meta, o, d))
    hit, t_prim = timed("traverse 262k coherent", trav, origin, direction)
    visits = np.asarray(hit.visits)
    print(f"  visits/packet: mean={visits[::1024].mean():.0f} "
          f"max={visits[::1024].max()}  hitrate={(np.asarray(hit.slot) >= 0).mean():.2f}")

    # 2. random-direction rays from hit points (incoherent), sorted vs not
    k2 = jax.random.split(key, 3)
    d = jax.random.normal(k2[0], (3, n))
    d = d / jnp.linalg.norm(d, axis=0)
    rnd_dir = V3(d[0], d[1], d[2])
    p = jax.tree.map(lambda a, b: a + b * hit.t, origin, direction)
    active = jnp.ones((n,), bool)
    s_trav = jax.jit(lambda o, d: sorted_intersect(arrays, cfg, meta, o, d,
                                                   active))
    hit2, t_sorted = timed("traverse 262k incoherent sorted", s_trav, p, rnd_dir)
    v2 = np.asarray(hit2.visits)
    print(f"  visits/packet: mean={v2[::1024].mean():.0f} max={v2[::1024].max()}")
    hit3, t_raw = timed("traverse 262k incoherent unsorted", trav, p, rnd_dir)
    v3 = np.asarray(hit3.visits)
    print(f"  visits/packet: mean={v3[::1024].mean():.0f} max={v3[::1024].max()}")

    # 3. the sort machinery alone (9-operand lax.sort at 2N, like one bounce)
    m = 2 * n
    keys = jax.random.randint(k2[1], (m,), 0, 1 << 24)
    planes = [jax.random.normal(jax.random.fold_in(k2[2], i), (m,))
              for i in range(7)]

    def do_sort(keys, *pl):
        lane = jnp.arange(m, dtype=jnp.int32)
        return jax.lax.sort((keys, lane) + pl, num_keys=2, is_stable=False)

    _, t_sort = timed("lax.sort 9-op 524k", jax.jit(do_sort), keys, *planes)

    def do_argsort(keys, *pl):
        perm = jnp.argsort(keys)
        return tuple(p[perm] for p in pl)

    _, t_arg = timed("argsort+gather 524k", jax.jit(do_argsort), keys, *planes)

    # 4. full sample step
    def full(o, d):
        return trace_paths(arrays, cfg, meta, o, d, key)

    _, t_full = timed("full trace_paths (8 iters)", jax.jit(full),
                      origin, direction, reps=2)
    est_trav = t_prim + 8 * 2 * t_sorted  # 2N lanes per bounce ~ 2 launches
    print(f"\nsample step {t_full * 1e3:.0f}ms; traversal estimate "
          f"{est_trav * 1e3:.0f}ms; sort estimate {8 * t_sort * 1e3:.0f}ms; "
          f"residual(shading) {(t_full - est_trav - 8 * t_sort) * 1e3:.0f}ms")


if __name__ == "__main__":
    main()
