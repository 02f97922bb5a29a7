#!/usr/bin/env python
"""Full-step breakdown: traversal vs shading vs sort vs raygen.

Times each jitted piece of the sample step in isolation so end-to-end
rays/s can be explained (VERDICT.md round-1 item: "instrument first").

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_step.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core import integrator, vec
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import (PathState, _shade_and_scatter,
                                      sorted_intersect, trace_paths)
from fspt_tpu.core.rng import stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState, Renderer
from fspt_tpu.testing import make_bunny_standin_scene


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    subdiv = int(os.environ.get("FSPT_BENCH_SUBDIV", "6"))
    size = int(os.environ.get("FSPT_BENCH_SIZE", "512"))
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=1)
    n = size * size
    env_hw = (meta.env_h, meta.env_w)

    cam = CameraState.from_config(scene.camera)
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = jax.random.key(0)
    cam_u = stream_uniforms(key, 0, (4, n))

    raygen = jax.jit(lambda: generate_rays(
        cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
        cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx))
    dt, (origin, direction) = timeit(raygen)
    print(f"raygen            : {dt*1e3:8.2f} ms")

    prim = jax.jit(lambda o, d: integrator.intersect(
        arrays, cfg, meta, o, d))
    dt, hit = timeit(prim, origin, direction)
    print(f"primary traversal : {dt*1e3:8.2f} ms")

    # one shading iteration alone (its internal batched traversal included)
    state = PathState(
        origin=origin, direction=direction, t=hit.t, slot=hit.slot,
        bu=hit.u, bv=hit.v, throughput=vec.splat(1.0, like=origin.x),
        color=vec.splat(0.0, like=origin.x),
        bounces_used=jnp.zeros(n, jnp.int32), active=hit.slot >= 0,
        prev_pdf=jnp.full(n, 1.0e16, jnp.float32),
        lidx=jnp.arange(n, dtype=jnp.int32),
        gid=jnp.arange(n, dtype=jnp.int32))
    u = stream_uniforms(key, 1, (11, n))
    attr = integrator._attr_table(arrays)
    tex = integrator._packed_tables(arrays, cfg, meta)

    shade = jax.jit(lambda s: _shade_and_scatter(scene=arrays, cfg=cfg,
                                                 meta=meta, s=s, u=u,
                                                 env_hw=env_hw,
                                                 attr=attr, tex=tex))
    dt_full, state2 = timeit(shade, state)
    print(f"shade+2N traversal: {dt_full*1e3:8.2f} ms "
          f"(occupancy {float(jnp.mean(state.active)):.2f})")

    # shading with the traversal swapped for a no-op (isolates gathers etc.)
    real_sorted = integrator.sorted_intersect
    try:
        def fake_sorted(scene_, cfg_, meta_, o, d, a, tmax=None,
                        any_hit=False):
            z = jnp.zeros_like(o.x)
            return integrator.PacketHit(
                t=z + 1.0, slot=jnp.full(z.shape, -1, jnp.int32),
                u=z, v=z, visits=jnp.zeros(z.shape, jnp.int32))
        integrator.sorted_intersect = fake_sorted
        shade_nt = jax.jit(lambda s: _shade_and_scatter(
            scene=arrays, cfg=cfg, meta=meta, s=s, u=u, env_hw=env_hw,
            attr=attr, tex=tex))
        dt_nt, _ = timeit(shade_nt, state)
        print(f"shade (no trav)   : {dt_nt*1e3:8.2f} ms "
              f"-> traversal share {dt_full-dt_nt:.4f} s")
    finally:
        integrator.sorted_intersect = real_sorted

    # the sort machinery alone
    def just_sort(o, d, a):
        return sorted_intersect(arrays, cfg, meta, o, d, a)
    # measured within shade already; estimate sort by sorting 2N rays
    N2 = 2 * n
    k2 = jax.random.key(1)
    uu = jax.random.uniform(k2, (7, N2))
    o2 = V3(uu[0], uu[1], uu[2])
    d2 = V3(uu[3] + 0.1, uu[4] + 0.1, uu[5] + 0.1)

    from fspt_tpu.core.integrator import _morton21
    def sort_only(o, d):
        octant = ((d.x < 0).astype(jnp.int32) * 4
                  + (d.y < 0).astype(jnp.int32) * 2
                  + (d.z < 0).astype(jnp.int32))
        key_ = (octant << 21) | _morton21(o.x, o.y, o.z)
        lane = jnp.arange(N2, dtype=jnp.int32)
        out = jax.lax.sort((key_, lane, o.x, o.y, o.z, d.x, d.y, d.z,
                            uu[6]), num_keys=2, is_stable=False)
        inv = jnp.argsort(out[1])
        return out[2][inv]
    dt, _ = timeit(jax.jit(sort_only), o2, d2)
    print(f"sort(2N)+invperm  : {dt*1e3:8.2f} ms")

    # full trace_paths and full step
    tp = jax.jit(lambda o, d: trace_paths(arrays, cfg, meta, o, d, key))
    dt, _ = timeit(tp, origin, direction, iters=4)
    print(f"trace_paths       : {dt*1e3:8.2f} ms")

    r = Renderer(scene, cfg)
    r.step()
    dt, _ = timeit(lambda: r.step() and None or r.count, iters=4, warmup=1)
    print(f"full step         : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
