#!/usr/bin/env python
"""Round-4 sweep #1: software-pipelined node fetch in the walk kernel.

Stages:
  value — round-3 baseline (fetch -> node tests -> leaf tests, serial)
  pipe  — node-advance first, next row copied between advance and leaf
          tests (Mosaic may overlap the copy with leaf vector math)
  dma   — same order, fetch as explicit double-buffered async DMA

Sweeps stage x walks x unroll on coherent camera rays and sorted
incoherent bounce rays, asserting bit-identical hits vs the baseline.

Usage: PYTHONPATH=/root/repo python scripts/perf_r4.py
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


def timed(name, fn, *args, reps=8):
    t0 = time.time()
    drain(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    r = (time.time() - t0) / reps
    print(f"{name:34s} compile={c:6.1f}s run={r * 1e3:8.2f}ms", flush=True)
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
    drain(origin)

    def trav(**kw):
        return jax.jit(lambda o, d: packet_traverse3(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth, **kw))

    base = trav(unroll=4, stage="value", walks=8)
    h1, _ = timed("baseline w8 U4 value coh", base, origin, direction)
    hit = h1
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
    sp = jax.tree.map(lambda a: a[perm], p)
    sd = jax.tree.map(lambda a: a[perm], rnd)
    drain((sp, sd))
    h1i, _ = timed("baseline w8 U4 value inc", base, sp, sd)
    ref = {"coh": (np.asarray(h1.slot), np.asarray(h1.t)),
           "inc": (np.asarray(h1i.slot), np.asarray(h1i.t))}

    for stage in ("pipe", "dma"):
        for walks in (8, 16, 32):
            for unroll in (2, 4, 8):
                fn = trav(unroll=unroll, stage=stage, walks=walks)
                for label, o_, d_, rk in (("coh", origin, direction, "coh"),
                                          ("inc", sp, sd, "inc")):
                    out, dt = timed(f"{stage} w={walks} U={unroll} {label}",
                                    fn, o_, d_)
                    s, t = np.asarray(out.slot), np.asarray(out.t)
                    rs, rt = ref[rk]
                    ok = (s == rs).all() and np.allclose(t, rt, atol=1e-5)
                    vis = np.asarray(out.visits)[::128]
                    prog = vis.reshape(-1, walks).max(axis=1).sum()
                    print(f"   match={ok} visits/walk={vis.mean():6.1f} "
                          f"progsteps={prog} ns/pstep={dt / prog * 1e9:5.0f} "
                          f"Mrays/s={n / dt / 1e6:7.1f}", flush=True)
                    assert ok, f"hit mismatch {stage} w={walks} U={unroll}"


if __name__ == "__main__":
    main()
