#!/usr/bin/env python
"""Round-3 consolidated TPU measurement: v1-vs-v3 kernel micro, full-step
timing with the walk kernel, and a compile-time breakdown — one process,
one device claim (killed TPU clients wedge the axon claim for ~25 min, so
everything rides a single run).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r3b.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import _morton21, trace_paths
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse import packet_traverse
from fspt_tpu.ops.traverse3 import packet_traverse3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def timed(name, fn, *args, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    r = (time.time() - t0) / reps
    print(f"{name:42s} compile={c:6.1f}s run={r * 1e3:8.2f}ms", flush=True)
    return out, r


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    print("tris", scene.num_triangles, flush=True)
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
    origin = jax.block_until_ready(origin)
    print("rays ready", flush=True)

    def trav(impl):
        return jax.jit(lambda o, d: impl(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth))

    hit, _ = timed("v3 coherent (primary)", trav(packet_traverse3),
                   origin, direction)
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
    perm = jnp.argsort((octant << 21) | mort)
    sp = jax.tree.map(lambda a: a[perm], p)
    sd = jax.tree.map(lambda a: a[perm], rnd)
    sp, sd = jax.block_until_ready((sp, sd))
    print("sorted ready", flush=True)

    for name, impl, g in (("v3", packet_traverse3, 128),
                          ("v1", packet_traverse, 1024)):
        for label, o_, d_ in (("coherent", origin, direction),
                              ("incoh-sorted", sp, sd)):
            out, dt = timed(f"{name} {label}", trav(impl), o_, d_)
            vis = np.asarray(out.visits)[::g]
            tot = vis.sum()
            print(f"   visits/grp mean={vis.mean():7.1f} total={tot} "
                  f"ns/visit={dt / tot * 1e9:6.0f} "
                  f"Mrays/s={n / dt / 1e6:7.1f}", flush=True)

    # full sample step, walk kernel
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=1)
    step = jax.jit(lambda o, d: trace_paths(arrays, cfg, meta, o, d, key,
                                            return_stats=True))
    (rad, st), dt = timed("full trace_paths walk (8 iters)", step,
                          origin, direction, reps=3)
    honest = float(st.rays)
    print(f"   honest rays/sample={honest:.3e} -> "
          f"{honest / dt / 1e6:.1f} Mrays/s "
          f"(lane upper bound {n * 17 / dt / 1e6:.1f})", flush=True)
    occ = np.asarray(st.active) / n
    print("   scatter occupancy/bounce:",
          " ".join(f"{x:.2f}" for x in occ), flush=True)
    vis = np.asarray(st.visits) / n
    print("   visits/lane/bounce:",
          " ".join(f"{x:.0f}" for x in vis), flush=True)

    # compile-time breakdown of the pieces (fresh jit instances)
    lane = jnp.arange(2 * n, dtype=jnp.int32)
    keys = jax.random.randint(k2[1], (2 * n,), 0, 1 << 24)

    def do_sort(keys):
        return jax.lax.sort((keys, lane), num_keys=2, is_stable=False)

    timed("2-op lax.sort 524k (compile col)", jax.jit(do_sort), keys,
          reps=3)


if __name__ == "__main__":
    main()
