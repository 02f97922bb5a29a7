#!/usr/bin/env python
"""Traversal micro-benchmark: where does the render time actually go?

Measures, on the bench scene (bunny-scale standin):
  * packet_traverse wall time for coherent (camera tile) and incoherent
    (sorted random bounce-like) ray sets,
  * visited wide-nodes per packet -> ns per packet-visit (the kernel's
    per-iteration overhead, the quantity VERDICT.md round-1 says to cut),
  * full sample-step time and per-bounce occupancy so the kernel numbers
    can be reconciled against end-to-end rays/s.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_traverse.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import _use_interpret, sorted_intersect
from fspt_tpu.core.rng import stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse import PACKET, packet_traverse
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState, Renderer
from fspt_tpu.testing import make_bunny_standin_scene


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # drain via a scalar fetch too (axon treats block_until_ready loosely)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
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
    npk = n // PACKET
    print(f"# tris={scene.num_triangles} wide_nodes={arrays.pk_nodes.shape[0]} "
          f"leaves={arrays.pk_leaves.shape[0]} n_rays={n} packets={npk}",
          file=sys.stderr)

    cam = CameraState.from_config(scene.camera)
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = jax.random.key(0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(cam.position, cam.direction,
                                      cam.fov_scale, cam.focal_depth,
                                      cam.aperture, (size, size), cam_u,
                                      pixel_idx=pixel_idx)

    trav = jax.jit(lambda o, d: packet_traverse(
        arrays.pk_nodes, arrays.pk_leaves, o, d,
        leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth,
        interpret=_use_interpret()))

    # --- coherent camera rays -------------------------------------------
    dt, hit = timeit(trav, origin, direction)
    visits = np.asarray(hit.visits).reshape(npk, PACKET)[:, 0]
    tot_visits = float(visits.sum())
    print(f"camera   : {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Mrays/s  "
          f"visits/packet={visits.mean():7.1f}  ns/visit={dt/tot_visits*1e9:6.0f}")

    # --- incoherent bounce-like rays (hemisphere random from hit points) --
    k2 = jax.random.key(1)
    u = jax.random.uniform(k2, (6, n))
    wmin = np.asarray(arrays.node_min[0])
    wmax = np.asarray(arrays.node_max[0])
    o = V3(*(u[i] * (wmax[i] - wmin[i]) + wmin[i] for i in range(3)))
    z = u[3] * 2 - 1
    phi = u[4] * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    d = V3(s * jnp.cos(phi), s * jnp.sin(phi), z)

    dt, hit = timeit(trav, o, d)
    visits = np.asarray(hit.visits).reshape(npk, PACKET)[:, 0]
    tot_visits = float(visits.sum())
    print(f"random   : {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Mrays/s  "
          f"visits/packet={visits.mean():7.1f}  ns/visit={dt/tot_visits*1e9:6.0f}")

    # --- random rays through the sorted_intersect path --------------------
    sint = jax.jit(lambda o, d, a: sorted_intersect(
        arrays, cfg, meta, o, d, a))
    active = jnp.ones((n,), bool)
    dt, hit = timeit(sint, o, d, active)
    visits = np.asarray(hit.visits).reshape(npk, PACKET)[:, 0]
    tot_visits = float(visits.sum())
    print(f"rnd+sort : {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} Mrays/s  "
          f"visits/packet={visits.mean():7.1f}  ns/visit={dt/tot_visits*1e9:6.0f}")

    # --- half-occupancy sorted (bounce-3-like) ----------------------------
    active = jax.random.uniform(jax.random.key(7), (n,)) < 0.25
    dt, hit = timeit(sint, o, d, active)
    print(f"25%+sort : {dt*1e3:8.2f} ms  "
          f"{float(active.sum())/dt/1e6:8.1f} Mrays/s (live)")

    # --- full sample step --------------------------------------------------
    if os.environ.get("FSPT_PERF_STEP", "1") == "1":
        r = Renderer(scene, cfg)
        t0 = time.perf_counter()
        r.step()
        print(f"step compile+1: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        dt, _ = timeit(lambda: r.step() and None or r.count, iters=4, warmup=1)
        rays = n * (1 + 2 * cfg.max_iters)
        print(f"full step: {dt*1e3:8.2f} ms  {rays/dt/1e6:8.1f} Mrays/s "
              f"(all-lane count)")


if __name__ == "__main__":
    main()


def sweep_interleave():
    """A/B interleave factors on coherent + incoherent ray sets."""
    subdiv = int(os.environ.get("FSPT_BENCH_SUBDIV", "6"))
    size = int(os.environ.get("FSPT_BENCH_SIZE", "512"))
    scene = make_bunny_standin_scene(subdivisions=subdiv)
    arrays = scene.device_arrays()
    meta = scene.meta
    n = size * size
    npk = n // PACKET

    cam = CameraState.from_config(scene.camera)
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = jax.random.key(0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(cam.position, cam.direction,
                                      cam.fov_scale, cam.focal_depth,
                                      cam.aperture, (size, size), cam_u,
                                      pixel_idx=pixel_idx)
    k2 = jax.random.key(1)
    u = jax.random.uniform(k2, (6, n))
    wmin = np.asarray(arrays.node_min[0])
    wmax = np.asarray(arrays.node_max[0])
    o = V3(*(u[i] * (wmax[i] - wmin[i]) + wmin[i] for i in range(3)))
    z = u[3] * 2 - 1
    phi = u[4] * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    d = V3(s * jnp.cos(phi), s * jnp.sin(phi), z)

    for il in (1, 2, 4, 8):
        trav = jax.jit(lambda o_, d_, il=il: packet_traverse(
            arrays.pk_nodes, arrays.pk_leaves, o_, d_,
            leaf_size=meta.leaf_size, stack_depth=meta.pk_stack_depth,
            interpret=_use_interpret(), interleave=il))
        dt, hit = timeit(trav, origin, direction)
        visits = np.asarray(hit.visits).reshape(npk, PACKET)[:, 0]
        tv = float(visits.sum())
        dt2, hit2 = timeit(trav, o, d)
        visits2 = np.asarray(hit2.visits).reshape(npk, PACKET)[:, 0]
        tv2 = float(visits2.sum())
        print(f"il={il}: camera {dt*1e3:7.2f} ms {n/dt/1e6:7.1f} Mray/s "
              f"ns/visit={dt/tv*1e9:5.0f} | random {dt2*1e3:7.2f} ms "
              f"{n/dt2/1e6:6.1f} Mray/s ns/visit={dt2/tv2*1e9:5.0f}")
