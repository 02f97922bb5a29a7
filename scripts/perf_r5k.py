#!/usr/bin/env python
"""Round-5: union-visit simulation for a DUAL-RAY (scatter+shadow paired
per lane) walk layout, before committing to a kernel.

Bounce-0 launches carry 2*w0 lanes: the scatter segment and the env-NEE
shadow segment, SAME origins pairwise (both start at the hit point).
The production layout sorts all 2*w0 lanes by (morton<<3 | octant) into
128-lane walks.  A dual-ray kernel would instead keep w0 lanes (one per
hit point), trace BOTH directions per lane, and halve the walk count —
each walk-visit row fetch then serves two rays.  Whether that pays is a
pure geometry question: how much does the per-walk want-UNION grow when
every walk carries 128 origins x 2 directions instead of ~128
position-sorted single rays?

This script answers it exactly (modulo best-t feedback, absent from
both sides equally): a NumPy frontier traversal records every (ray,
node) want, then walk-level unions are distinct-(walk, node) counts
under each layout.  Decision rule: a dual-ray kernel costs ~+10% per
substep (doubled slab/MT under the latency floor) and halves walks, so
it pays iff union_visits(paired) / union_visits(production) < ~0.75.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5k.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import (PathState, _attr_table, _compact,
                                      _compact_groups, _morton21,
                                      _packed_tables, _shade_and_scatter,
                                      intersect, sorted_intersect)
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.scene.bvh import triangle_aabbs
from fspt_tpu.scene.fastbvh import build_bvh_fast
from fspt_tpu.testing import make_bunny_standin_scene

from r5common import drain  # noqa: E402


def capture_unsorted(scene, arrays, meta, cfg, size=512):
    """Bounce-0 launch rays in SEGMENT order (scatter block then shadow
    block, pre-coherence-sort) — r5common.capture_bounce0 minus the
    production sort, so pairing information survives."""
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
    return drain((o, d, tmax, a))


def ray_node_wants(bvh, o, d, tmax, active):
    """Frontier traversal (own-tmax culling, no best-t feedback):
    returns (ray_idx, node_idx) arrays of every node want."""
    left, right, tri = bvh.left, bvh.right, bvh.tri_offset
    nmin, nmax = bvh.node_min, bvh.node_max
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    ridx = np.nonzero(active)[0].astype(np.int32)
    nodes = np.zeros(len(ridx), np.int32)
    vr, vn = [], []
    while len(ridx):
        bmin = nmin[nodes]
        bmax = nmax[nodes]
        t1 = (bmin - o[ridx]) * inv[ridx]
        t2 = (bmax - o[ridx]) * inv[ridx]
        tlo = np.minimum(t1, t2).max(axis=1)
        thi = np.maximum(t1, t2).min(axis=1)
        hit = (thi >= tlo) & (thi > 0.0) & (tlo < tmax[ridx])
        ridx, nodes = ridx[hit], nodes[hit]
        vr.append(ridx)
        vn.append(nodes)
        inner = tri[nodes] < 0
        ridx2 = ridx[inner]
        nodes2 = nodes[inner]
        ridx = np.concatenate([ridx2, ridx2])
        nodes = np.concatenate([left[nodes2], right[nodes2]])
    return np.concatenate(vr), np.concatenate(vn)


def union_visits(walk_of_ray, want_r, want_n, n_nodes):
    """Total distinct (walk, node) pairs given each ray's walk id."""
    key = walk_of_ray[want_r].astype(np.int64) * n_nodes + want_n
    return len(np.unique(key))


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, compact=True,
                       intersector="split",
                       compact_schedule=(1.5, 11, 48, 160, 640,
                                         2048, 2048, 2048))
    print("capturing unsorted bounce-0 launch ...", flush=True)
    o, d, tm, a = capture_unsorted(scene, arrays, meta, cfg)
    nl = int(o.x.shape[0])
    w0 = nl // 2
    o_np = np.stack([np.asarray(o.x), np.asarray(o.y),
                     np.asarray(o.z)], -1).astype(np.float32)
    d_np = np.stack([np.asarray(d.x), np.asarray(d.y),
                     np.asarray(d.z)], -1).astype(np.float32)
    tm_np = np.asarray(tm)
    a_np = np.asarray(a)
    same_origin = np.allclose(o_np[:w0][a_np[:w0] & a_np[w0:]],
                              o_np[w0:][a_np[:w0] & a_np[w0:]])
    print(f"lanes={nl} active={int(a_np.sum())} "
          f"scatter_active={int(a_np[:w0].sum())} "
          f"shadow_active={int(a_np[w0:].sum())} "
          f"segments_share_origins={same_origin}")

    tmin, tmax_t = triangle_aabbs(
        np.stack([arrays.tri_v0,
                  arrays.tri_v0 + arrays.tri_e1,
                  arrays.tri_v0 + arrays.tri_e2], axis=1))
    bvh = build_bvh_fast(np.asarray(tmin), np.asarray(tmax_t), leaf_size=8)
    n_nodes = len(bvh.left)

    want_r, want_n = ray_node_wants(bvh, o_np, d_np, tm_np, a_np)
    lone = len(np.unique(want_r.astype(np.int64) * n_nodes + want_n))
    print(f"lone-ray visit total: {lone} "
          f"({lone / max(a_np.sum(), 1):.1f}/ray)")

    wmin = bvh.node_min[0]
    ext = np.maximum(bvh.node_max[0] - wmin, 1e-6)
    morton = np.asarray(_morton21(
        jnp.asarray((o_np[:, 0] - wmin[0]) / ext[0]),
        jnp.asarray((o_np[:, 1] - wmin[1]) / ext[1]),
        jnp.asarray((o_np[:, 2] - wmin[2]) / ext[2])))
    octant = ((d_np[:, 0] < 0).astype(np.int64) * 4
              + (d_np[:, 1] < 0).astype(np.int64) * 2
              + (d_np[:, 2] < 0).astype(np.int64))

    # ---- layout A: production (all lanes, morton<<3|octant, 128/walk)
    key_a = np.where(a_np, (morton.astype(np.int64) << 3) | octant,
                     np.int64(1) << 40)
    order_a = np.argsort(key_a, kind="stable")
    walk_a = np.empty(nl, np.int64)
    walk_a[order_a] = np.arange(nl) // 128
    ua = union_visits(walk_a, want_r, want_n, n_nodes)
    walks_a = int(np.ceil(a_np.sum() / 128))
    print(f"A production layout: union visits={ua} "
          f"({ua / max(walks_a, 1):.1f}/active-walk, {nl // 128} walks)")

    # ---- layout B: dual-ray pairs (one lane per hit point, both dirs;
    # sorted by morton of origin; 128 pairs/walk)
    pair_active = a_np[:w0] | a_np[w0:]
    key_b = np.where(pair_active, morton[:w0].astype(np.int64),
                     np.int64(1) << 40)
    order_b = np.argsort(key_b, kind="stable")
    pwalk = np.empty(w0, np.int64)
    pwalk[order_b] = np.arange(w0) // 128
    walk_b = np.concatenate([pwalk, pwalk])      # ray i and i+w0 same walk
    ub = union_visits(walk_b, want_r, want_n, n_nodes)
    walks_b = int(np.ceil(pair_active.sum() / 128))
    print(f"B dual-ray paired:   union visits={ub} "
          f"({ub / max(walks_b, 1):.1f}/active-walk, {w0 // 128} walks)")

    # ---- layout C: pairs sorted by morton|scatter-octant ---------------
    key_c = np.where(pair_active,
                     (morton[:w0].astype(np.int64) << 3) | octant[:w0],
                     np.int64(1) << 40)
    order_c = np.argsort(key_c, kind="stable")
    pwalk_c = np.empty(w0, np.int64)
    pwalk_c[order_c] = np.arange(w0) // 128
    walk_c = np.concatenate([pwalk_c, pwalk_c])
    uc = union_visits(walk_c, want_r, want_n, n_nodes)
    print(f"C paired, octant key: union visits={uc}")

    best = min(ub, uc)
    ratio = best / ua
    pred = ratio * 1.10
    print(f"\npaired/production union ratio = {ratio:.3f}; predicted "
          f"dual-ray time ratio ~{pred:.2f} (incl. +10% substep cost) -> "
          f"{'WORTH BUILDING' if pred < 0.85 else 'NOT WORTH BUILDING'}")


if __name__ == "__main__":
    main()
