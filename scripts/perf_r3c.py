#!/usr/bin/env python
"""Round-3 kernel-variant sweep on the real device: unroll x stage for the
v3 walk kernel, on coherent and incoherent-sorted workloads, with v1 as the
baseline and hit-equality asserts against it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r3c.py
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
    print(f"{name:40s} compile={c:6.1f}s run={r * 1e3:8.2f}ms", flush=True)
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

    def trav(**kw):
        return jax.jit(lambda o, d: packet_traverse3(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth, **kw))

    v1 = jax.jit(lambda o, d: packet_traverse(
        arrays.pk_nodes, arrays.pk_leaves, o, d,
        leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth))

    h1, _ = timed("v1 coherent", v1, origin, direction)
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
    perm = jnp.argsort((octant << 21) | mort)
    sp = jax.tree.map(lambda a: a[perm], p)
    sd = jax.tree.map(lambda a: a[perm], rnd)
    sp, sd = jax.block_until_ready((sp, sd))
    h1i, _ = timed("v1 incoh-sorted", v1, sp, sd)
    ref = {"coh": (np.asarray(h1.slot), np.asarray(h1.t)),
           "inc": (np.asarray(h1i.slot), np.asarray(h1i.t))}

    for unroll in (1, 2, 4, 8):
        for stage in ("value", "ref"):
            fn = trav(unroll=unroll, stage=stage)
            for label, o_, d_, rk in (("coh", origin, direction, "coh"),
                                      ("inc", sp, sd, "inc")):
                out, dt = timed(f"v3 U={unroll} {stage} {label}", fn, o_, d_)
                s, t = np.asarray(out.slot), np.asarray(out.t)
                rs, rt = ref[rk]
                ok = (s == rs).all() and np.allclose(t, rt, atol=1e-5)
                vis = np.asarray(out.visits)[::128]
                print(f"   match={ok} visits/walk mean={vis.mean():6.1f} "
                      f"total={vis.sum()} ns/visit={dt / vis.sum() * 1e9:5.0f} "
                      f"Mrays/s={n / dt / 1e6:7.1f}", flush=True)
                assert ok, f"hit mismatch U={unroll} {stage} {label}"


if __name__ == "__main__":
    main()
