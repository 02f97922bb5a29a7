#!/usr/bin/env python
"""Shared round-5 perf helpers: real bounce-0 launch capture + timing."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import (PathState, _attr_table, _compact,
                                      _compact_groups, _morton21,
                                      _packed_tables, _shade_and_scatter,
                                      intersect, sorted_intersect)
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])
    return out


def timed(fn, *args, reps=10):
    drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / reps


def capture_bounce0(scene, arrays, meta, cfg, size=512):
    """Real bounce-0 launch rays (scatter+shadow, post-compaction), sorted
    by the production coherence key — the exact input the traversal sees."""
    cam = CameraState.from_config(scene.camera)
    n = size * size
    env_hw = (meta.env_h, meta.env_w)
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = sample_key(jax.random.key(0), 0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(
        cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
        cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)
    primary = drain(jax.jit(
        lambda o, d: intersect(arrays, cfg, meta, o, d))(origin, direction))
    tex = _packed_tables(arrays, cfg, meta)
    attr = _attr_table(arrays)
    from fspt_tpu.core.env import env_radiance_rows
    miss = primary.slot < 0
    zero = jnp.zeros(n, jnp.float32)
    color = jax.tree.map(
        lambda c: jnp.where(miss, c, zero),
        env_radiance_rows(tex.env6, env_hw, direction, arrays.env_theta))
    state = PathState(
        origin=origin, direction=direction, t=primary.t, slot=primary.slot,
        bu=primary.u, bv=primary.v,
        throughput=V3(zero + 1, zero + 1, zero + 1), color=color,
        bounces_used=jnp.zeros(n, jnp.int32), active=~miss,
        prev_pdf=jnp.full(n, 1.0e16, jnp.float32),
        lidx=jnp.arange(n, dtype=jnp.int32),
        gid=jnp.arange(n, dtype=jnp.int32))
    w0 = _compact_groups(cfg, n)[0][0]
    if w0 < n:
        state, _, _ = jax.jit(functools.partial(
            _compact, it=0, w_out=w0))(state, key)

    rec = []

    def fn(o, d, a, tmax, any_hit=False):
        rec.append((o, d, a, tmax))
        return sorted_intersect(arrays, cfg, meta, o, d, a, tmax=tmax,
                                any_hit=any_hit)

    u = stream_uniforms(key, 1, (11, w0), lane_offset=state.gid)

    def step_and_capture(s, uu):
        rec.clear()
        out = _shade_and_scatter(arrays, cfg, meta, s, uu, env_hw, attr,
                                 tex, trace_fn=fn)
        return out, rec[0]
    _, (o, d, a, tmax) = jax.jit(step_and_capture)(state, u)
    # production pre-sort (morton of origin | octant)
    octant = ((d.x < 0).astype(jnp.int32) * 4
              + (d.y < 0).astype(jnp.int32) * 2
              + (d.z < 0).astype(jnp.int32))
    wmin = arrays.node_min[0]
    ext = jnp.maximum(arrays.node_max[0] - wmin, 1e-6)
    morton = _morton21((o.x - wmin[0]) / ext[0], (o.y - wmin[1]) / ext[1],
                       (o.z - wmin[2]) / ext[2])
    ikey = jnp.where(a, (morton << 3) | octant, jnp.int32(1) << 30)
    perm = jnp.argsort(ikey)
    so = V3(o.x[perm], o.y[perm], o.z[perm])
    sd = V3(d.x[perm], d.y[perm], d.z[perm])
    return drain((so, sd, tmax[perm], a[perm]))

