#!/usr/bin/env python
"""Round-4 probe: how fast does the walk node-set union shrink with walk
width?  Trace the SAME sorted bounce rays with each consecutive group of
G in {128, 64, 32, 16} rays duplicated to fill a 128-lane walk — a
duplicated ray adds nothing to the union, so visits/walk measures the
G-ray union directly (at 128/G x the lane cost, which is irrelevant here).

This decides whether sub-128-lane walk granularity (2/4 walks per sublane
row with segment votes) can pay: the per-program-step cost would rise
~1.3-1.6x, so the union must shrink faster than that.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4c.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import _morton21
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse3 import packet_traverse3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def drain(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return out


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)
    size = 512
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = sample_key(jax.random.key(0), 0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(
        cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
        cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)

    trav = jax.jit(lambda o, d: packet_traverse3(
        arrays.pk_nodes, arrays.pk_leaves, o, d,
        leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth,
        unroll=4, stage="pipe"))
    hit = drain(trav(origin, direction))

    k2 = jax.random.split(key, 3)
    d = jax.random.normal(k2[0], (3, n))
    d = d / jnp.linalg.norm(d, axis=0)
    rnd = V3(d[0], d[1], d[2])
    p = jax.tree.map(lambda a, b: a + b * hit.t, origin, direction)
    octant = ((rnd.x < 0).astype(jnp.int32) * 4
              + (rnd.y < 0).astype(jnp.int32) * 2
              + (rnd.z < 0).astype(jnp.int32))
    wmin = arrays.node_min[0]
    ext = jnp.maximum(arrays.node_max[0] - wmin, 1e-6)
    mort = _morton21((p.x - wmin[0]) / ext[0], (p.y - wmin[1]) / ext[1],
                     (p.z - wmin[2]) / ext[2])
    perm = jnp.argsort((mort << 3) | octant)

    for name, rays_p, rays_d in (("coh(camera)", origin, direction),
                                 ("inc(sorted)",
                                  jax.tree.map(lambda a: a[perm], p),
                                  jax.tree.map(lambda a: a[perm], rnd))):
        for g in (128, 64, 32, 16):
            reps = 128 // g
            # stride-sample every reps-th G-ray group so the probe covers
            # the whole sorted population (taking the first n/reps rays
            # would measure only the first octants/tiles)
            take = lambda a: jnp.repeat(
                a.reshape(-1, g)[::reps], reps, axis=0).reshape(-1)
            o_ = jax.tree.map(take, rays_p)
            d_ = jax.tree.map(take, rays_d)
            out = drain(trav(o_, d_))
            vis = np.asarray(out.visits)[::128]
            prog = vis.reshape(-1, 8).max(axis=1)
            print(f"{name} G={g:3d}: union visits/walk mean={vis.mean():6.1f}"
                  f" p90={np.percentile(vis, 90):6.0f}"
                  f" progstep/prog mean={prog.mean():6.1f}", flush=True)


if __name__ == "__main__":
    main()
