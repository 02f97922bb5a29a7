#!/usr/bin/env python
"""Round-3 kernel experiments: packet-height (rows) sweep for the traversal
kernel on coherent and incoherent workloads, on the real device.

The round-2 data says the walk is scalar-issue-bound (~560-740 ns/visit at
rows=8 against a 150-250 ns vector floor), so taller packets should amortize
the scalar cost over more rays as long as the node-set union doesn't grow
proportionally.  This measures exactly that trade.

Usage: python scripts/perf_r3.py [subdiv]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse import packet_traverse
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def timed(name, fn, *args, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_s = (time.time() - t0) / reps
    print(f"{name:44s} compile={compile_s:6.1f}s  run={run_s * 1e3:8.2f}ms",
          flush=True)
    return out, run_s


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    size = 512
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    print(f"tris={scene.num_triangles}")
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

    from fspt_tpu.ops.traverse3 import packet_traverse3

    def trav(rows, impl=packet_traverse, interleave=1):
        return jax.jit(lambda o, d: impl(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth,
            rows=rows, interleave=interleave))

    # incoherent rays: random directions from primary hit points, sorted by
    # (octant, morton) exactly like sorted_intersect does
    hit = jax.block_until_ready(trav(8)(origin, direction))
    k2 = jax.random.split(key, 3)
    d = jax.random.normal(k2[0], (3, n))
    d = d / jnp.linalg.norm(d, axis=0)
    rnd_dir = V3(d[0], d[1], d[2])
    p = jax.tree.map(lambda a, b: a + b * hit.t, origin, direction)

    from fspt_tpu.core.integrator import _morton21
    octant = ((rnd_dir.x < 0).astype(jnp.int32) * 4
              + (rnd_dir.y < 0).astype(jnp.int32) * 2
              + (rnd_dir.z < 0).astype(jnp.int32))
    wmin = arrays.node_min[0]
    extent = jnp.maximum(arrays.node_max[0] - wmin, 1e-6)
    morton = _morton21((p.x - wmin[0]) / extent[0],
                       (p.y - wmin[1]) / extent[1],
                       (p.z - wmin[2]) / extent[2])
    perm = jnp.argsort((octant << 21) | morton)
    sp = jax.tree.map(lambda a: a[perm], p)
    sd = jax.tree.map(lambda a: a[perm], rnd_dir)
    sp, sd = jax.block_until_ready((sp, sd))

    cases = [("v1 rows=8", dict(rows=8, impl=packet_traverse)),
             ("v1 rows=16", dict(rows=16, impl=packet_traverse)),
             ("v1 rows=32", dict(rows=32, impl=packet_traverse))]
    for name, kw in cases:
        pk = kw["rows"] * 128
        for label, o_, d_ in (("coherent", origin, direction),
                              ("incoh-sorted", sp, sd)):
            fn = trav(**kw)
            out, dt = timed(f"{name} {label}", fn, o_, d_)
            visits = np.asarray(out.visits)[::pk]
            tot = visits.sum()
            print(f"    visits/packet mean={visits.mean():7.0f} "
                  f"max={visits.max():6d}  total={tot}  "
                  f"ns/visit={dt / tot * 1e9:6.0f}  "
                  f"Mrays/s={n / dt / 1e6:7.1f}", flush=True)


if __name__ == "__main__":
    main()
