#!/usr/bin/env python
"""Round-4 sweep #2: per-program fixed cost + phase-conditional substeps.

The w/U sweep (perf_r4.py) exposed a large PER-PROGRAM fixed cost: coherent
camera walks pay ~1830 ns/program-step (21 steps/program) vs ~1145
incoherent (134 steps/program); a two-point fit gives ~17 us/program of
overhead — suspiciously close to re-copying the ~6 MB node+leaf table
HBM->VMEM every grid program.

Stages measured here (all bit-identical, tests/test_fastbvh.py):
  hbm   — table input stays in HBM; copied ONCE into a persistent VMEM
          scratch at program 0 (kills any per-program table copy)
  cond  — pipe ordering + lax.cond skips: child slab tests skipped when no
          walk is at a node, leaf tests skipped when no walk is at a leaf
  condh — cond + hbm combined
Also: leaf_size=4 (reference default) vs 8 — leaf tests are ~2/3 of the
per-visit vector work; smaller leaves trade leaf math for more visits.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r4b.py
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
    print(f"{name:36s} compile={c:6.1f}s run={r * 1e3:8.2f}ms", flush=True)
    return out, r


def ray_sets(scene, size=512):
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = sample_key(jax.random.key(0), 0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(
        cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
        cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)
    base = jax.jit(lambda o, d: packet_traverse3(
        arrays.pk_nodes, arrays.pk_leaves, o, d,
        leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth,
        unroll=4, stage="value"))
    hit = drain(base(origin, direction))
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
    return arrays, meta, origin, direction, sp, sd, n


def sweep(scene, tag, stages, n_expect=512 * 512):
    arrays, meta, origin, direction, sp, sd, n = ray_sets(scene)

    def trav(**kw):
        return jax.jit(lambda o, d: packet_traverse3(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth, **kw))

    base = trav(unroll=4, stage="value", walks=8)
    h1, tc = timed(f"{tag} base value coh", base, origin, direction)
    h1i, ti = timed(f"{tag} base value inc", base, sp, sd)
    ref = {"coh": (np.asarray(h1.slot), np.asarray(h1.t)),
           "inc": (np.asarray(h1i.slot), np.asarray(h1i.t))}
    for stage in stages:
        for walks in (8,):
            for unroll in (4,):
                fn = trav(unroll=unroll, stage=stage, walks=walks)
                for label, o_, d_, rk in (("coh", origin, direction, "coh"),
                                          ("inc", sp, sd, "inc")):
                    out, dt = timed(
                        f"{tag} {stage} w{walks} U{unroll} {label}",
                        fn, o_, d_)
                    s, t = np.asarray(out.slot), np.asarray(out.t)
                    rs, rt = ref[rk]
                    ok = (s == rs).all() and np.allclose(t, rt, atol=1e-5)
                    vis = np.asarray(out.visits)[::128]
                    prog = vis.reshape(-1, walks).max(axis=1).sum()
                    print(f"   match={ok} visits/walk={vis.mean():6.1f} "
                          f"progsteps={prog} ns/pstep={dt / prog * 1e9:5.0f}"
                          f" Mrays/s={n / dt / 1e6:7.1f}", flush=True)
                    assert ok, f"mismatch {tag} {stage}"


def main():
    scene8 = make_bunny_standin_scene(subdivisions=6)
    print("tris", scene8.num_triangles, "leaf8", flush=True)
    sweep(scene8, "L8", ("hbm", "cond", "condh", "pipe"))
    # leaf_size sweep moved to /tmp-style probes recorded in PERF.md:
    # leaf4's tables exceed the VMEM budget (16 MiB) and must stream from
    # HBM (~1.6x), leaf6 fits but costs +8% — leaf 8 stays the default.


if __name__ == "__main__":
    main()
