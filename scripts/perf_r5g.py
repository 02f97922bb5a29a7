#!/usr/bin/env python
"""Round-5: where do bounce-0 unions come from — scatter vs shadow half,
and would a bin-major shadow order shrink shadow-walk unions?

The it0 launch concatenates the scatter segment (hemisphere-random
directions from hit points) and the env-NEE shadow segment (directions
clustered around sampled radiance bins).  Both ride the same Morton-of-
hit-point state order.  This measures each half separately and re-sorts
the shadow half by (owner-bin, hit-morton) to see if direction-major
ordering pays for long sky-bound rays.

Usage: PYTHONPATH=/root/repo:/root/.axon_site:scripts python scripts/perf_r5g.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from r5common import drain, timed

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import (PathState, _attr_table, _compact,
                                      _compact_groups, _morton21,
                                      _packed_tables, _shade_and_scatter,
                                      intersect, sorted_intersect)
from fspt_tpu.core.env import env_uv
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def capture_halves(scene, arrays, meta, cfg, size=512):
    """Like r5common.capture_bounce0 but returns the two segment halves
    (scatter, shadow) in pre-sort segment order."""
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
    return drain((o, d, a, tmax)), w0


def sort_by(o, d, tmax, key):
    lane = jnp.arange(o.x.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((key, lane), num_keys=1, is_stable=False)
    rows = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, tmax], -1)[perm]
    return (V3(rows[:, 0], rows[:, 1], rows[:, 2]),
            V3(rows[:, 3], rows[:, 4], rows[:, 5]), rows[:, 6])


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, compact=True,
                       intersector="split",
                       compact_schedule=(1.45, 9.5, 40, 128, 512,
                                         2048, 2048, 2048))
    print("capturing ...", flush=True)
    (o, d, a, tmax), w0 = capture_halves(scene, arrays, meta, cfg)
    halves = {
        "scatter": jax.tree.map(lambda x: x[:w0], (o, d, a, tmax)),
        "shadow": jax.tree.map(lambda x: x[w0:], (o, d, a, tmax)),
    }
    jit_raw = jax.jit(lambda oo, dd, tm: intersect(
        arrays, cfg, meta, oo, dd, tmax=tm))

    wmin = arrays.node_min[0]
    ext = jnp.maximum(arrays.node_max[0] - wmin, 1e-6)

    for name, (ho, hd, ha, htm) in halves.items():
        morton = _morton21((ho.x - wmin[0]) / ext[0],
                           (ho.y - wmin[1]) / ext[1],
                           (ho.z - wmin[2]) / ext[2])
        octant = ((hd.x < 0).astype(jnp.int32) * 4
                  + (hd.y < 0).astype(jnp.int32) * 2
                  + (hd.z < 0).astype(jnp.int32))
        key_pos = jnp.where(ha, (morton << 3) | octant, jnp.int32(1) << 30)
        so, sd_, stm = sort_by(ho, hd, htm, key_pos)
        t_pos = timed(jit_raw, so, sd_, stm, reps=5)
        hit = drain(jit_raw(so, sd_, stm))
        vis = np.asarray(hit.visits).reshape(-1, 128)[:, 0]
        print(f"{name:8s} position-major: {t_pos * 1e3:7.2f} ms  "
              f"visits/walk={vis.mean():6.1f}", flush=True)
        if name == "shadow":
            # owner-bin of each shadow dir (bins partition the env image)
            u_, v_ = env_uv(hd, arrays.env_theta)
            h, w = meta.env_h, meta.env_w
            px = jnp.mod(u_ * w, w)
            py = jnp.clip(v_ * h, 0, h - 1)
            nb = int(arrays.n_bins)
            x0 = np.asarray(arrays.bin_x0[:nb])
            y0 = np.asarray(arrays.bin_y0[:nb])
            x1 = np.asarray(arrays.bin_x1[:nb])
            y1 = np.asarray(arrays.bin_y1[:nb])
            pxn = np.asarray(px)
            pyn = np.asarray(py)
            owner = np.zeros(len(pxn), np.int32)
            for i in range(nb):
                inside = ((pxn >= x0[i]) & (pxn < x1[i])
                          & (pyn >= y0[i]) & (pyn < y1[i]))
                owner[inside] = i
            okey = jnp.where(ha, (jnp.asarray(owner) << 21) | morton,
                             jnp.int32(1) << 30)
            so, sd_, stm = sort_by(ho, hd, htm, okey)
            t_bin = timed(jit_raw, so, sd_, stm, reps=5)
            hit = drain(jit_raw(so, sd_, stm))
            vis = np.asarray(hit.visits).reshape(-1, 128)[:, 0]
            print(f"{name:8s} bin-major:      {t_bin * 1e3:7.2f} ms  "
                  f"visits/walk={vis.mean():6.1f}", flush=True)
            # direction-octant-major as a third reference
            dkey = jnp.where(ha, (octant << 21) | morton,
                             jnp.int32(1) << 30)
            so, sd_, stm = sort_by(ho, hd, htm, dkey)
            t_oct = timed(jit_raw, so, sd_, stm, reps=5)
            print(f"{name:8s} octant-major:   {t_oct * 1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
