#!/usr/bin/env python
"""Round-5 ceiling attack: measured A/B of a TWO-LEVEL (TLAS + dense
treelet) traversal decomposition against the lockstep multiwalk kernel,
on the REAL captured bounce-0 ray set (VERDICT round-5 item 1).

The lockstep walk's ~55 Mrays/s ceiling argument (PERF.md) rests on the
128-lane union tax being paid in the SERIAL program-step domain.  The
two-level scheme moves leaf work into a dense phase: a shallow TLAS walk
over ~T-triangle treelets assigns rays to treelets, then each (ray,
treelet) pair is tested densely at full VPU occupancy.  This script
measures each component on real data and composes the total:

  A. baseline: production kernel traversal time on the captured launch;
  B. TLAS walk: the same multiwalk kernel over a leaf_size=T SAH tree
     with 1-dummy-triangle leaf rows (node descent + want enumeration,
     zero leaf work) — measured time + visit counts;
  C. pair statistics: an exact NumPy frontier traversal (no best-hit
     feedback, exactly the information a two-phase scheme has) counts
     lane-level and walk-level (ray, treelet) pairs;
  D. queue build: a real lax.sort over the pair keys + the (P, 7) ray
     row gather at the measured pair count;
  E. dense MT: a Pallas kernel testing 1024-pair tiles against their
     treelet's T triangles (fetch row + Moller-Trumbore per triangle,
     the same inner code the walk kernel's leaf branch runs), at the
     measured tile count.

Output: component table + composed ms vs baseline + go/no-go.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5_treelet.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import (PathState, _attr_table, _compact,
                                      _compact_groups, _morton21,
                                      _packed_tables, _shade_and_scatter,
                                      intersect, sorted_intersect)
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.ops import packing
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.scene.fastbvh import build_bvh_fast
from fspt_tpu.scene.bvh import triangle_aabbs
from fspt_tpu.testing import make_bunny_standin_scene


from r5common import capture_bounce0, drain, timed  # noqa: E402



def frontier_pairs(bvh, o, d, tmax, active, treelet_leaf):
    """Exact (ray, treelet-leaf) pair enumeration by BFS frontier — NO
    best-hit feedback, i.e. exactly the wants a two-phase scheme has."""
    left, right, tri = bvh.left, bvh.right, bvh.tri_offset
    nmin, nmax = bvh.node_min, bvh.node_max
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e-20, 1e-20), d)
    ridx = np.nonzero(active)[0].astype(np.int32)
    nodes = np.zeros(len(ridx), np.int32)
    pairs_r, pairs_l = [], []
    total_visits = 0
    while len(ridx):
        total_visits += len(ridx)
        bmin = nmin[nodes]
        bmax = nmax[nodes]
        t1 = (bmin - o[ridx]) * inv[ridx]
        t2 = (bmax - o[ridx]) * inv[ridx]
        tlo = np.minimum(t1, t2).max(axis=1)
        thi = np.maximum(t1, t2).min(axis=1)
        hit = (thi >= tlo) & (thi > 0.0) & (tlo < tmax[ridx])
        ridx, nodes = ridx[hit], nodes[hit]
        leaf = tri[nodes] >= 0
        pairs_r.append(ridx[leaf])
        pairs_l.append(tri[nodes[leaf]] // treelet_leaf)
        ridx2 = ridx[~leaf]
        nodes2 = nodes[~leaf]
        ridx = np.concatenate([ridx2, ridx2])
        nodes = np.concatenate([left[nodes2], right[nodes2]])
    return (np.concatenate(pairs_r), np.concatenate(pairs_l), total_visits)


def dense_mt_kernel(tile_tl_ref, tris_ref, rays_ref, t_ref, slot_ref,
                    panel, *, T: int):
    """One 1024-pair tile vs its treelet's T triangles."""
    tl = tile_tl_ref[pl.program_id(0), 0]
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    bt = rays_ref[0, 6]
    bs = jnp.full((8, 128), -1, jnp.int32)
    # triangle rows live (T//8, 72)-packed like leaf rows: 8 tris per row
    for r in range(T // 8):
        panel[:, :] = tris_ref[pl.ds(tl * (T // 8) + r, 1), :]
        for j in range(8):
            b = 9 * j
            c = [panel[:, b + i:b + i + 1] for i in range(9)]
            px = dy * c[8] - dz * c[7]
            py = dz * c[6] - dx * c[8]
            pz = dx * c[7] - dy * c[6]
            det = c[3] * px + c[4] * py + c[5] * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
            tx = ox - c[0]
            ty = oy - c[1]
            tz = oz - c[2]
            uu = (tx * px + ty * py + tz * pz) * inv
            qx = ty * c[5] - tz * c[4]
            qy = tz * c[3] - tx * c[5]
            qz = tx * c[4] - ty * c[3]
            ww = (dx * qx + dy * qy + dz * qz) * inv
            tt = (c[6] * qx + c[7] * qy + c[8] * qz) * inv
            ok = ((jnp.abs(det) >= 1e-6)
                  & (uu >= 0.0) & (uu <= 1.0) & (ww >= 0.0)
                  & (uu + ww <= 1.0) & (tt > 1e-6) & (tt < bt))
            bt = jnp.where(ok, tt, bt)
            bs = jnp.where(ok, (r * 8 + j), bs)
    t_ref[0] = bt
    slot_ref[0] = bs


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, compact=True,
                       intersector="split",
                       compact_schedule=(1.45, 9.5, 40, 128, 512,
                                         2048, 2048, 2048))
    print("capturing bounce-0 launch ...", flush=True)
    so, sd, stm, sa = capture_bounce0(scene, arrays, meta, cfg)
    nl = int(so.x.shape[0])
    print(f"launch lanes={nl} active={int(np.asarray(sa).sum())}")

    # ---- A: baseline production traversal ------------------------------
    jit_raw = jax.jit(lambda o, d, tm: intersect(arrays, cfg, meta, o, d,
                                                 tmax=tm))
    t_base = timed(jit_raw, so, sd, stm, reps=5)
    print(f"A baseline walk traversal      {t_base * 1e3:8.2f} ms")

    o_np = np.stack([np.asarray(so.x), np.asarray(so.y),
                     np.asarray(so.z)], -1).astype(np.float32)
    d_np = np.stack([np.asarray(sd.x), np.asarray(sd.y),
                     np.asarray(sd.z)], -1).astype(np.float32)
    tm_np = np.asarray(stm)
    a_np = np.asarray(sa)

    from fspt_tpu.ops.traverse3 import packet_traverse3
    for T in (64, 128):
        # ---- B: TLAS walk probe (leaf_size=T SAH tree, dummy leaves) ----
        tmin, tmax_t = triangle_aabbs(
            np.stack([arrays.tri_v0,
                      arrays.tri_v0 + arrays.tri_e1,
                      arrays.tri_v0 + arrays.tri_e2], axis=1))
        bvh = build_bvh_fast(np.asarray(tmin), np.asarray(tmax_t),
                             leaf_size=T)
        n_tl = int((bvh.tri_offset >= 0).sum())
        dummy = np.zeros((n_tl, 3), np.float32)
        pk = packing.pack_bvh(bvh.left, bvh.right,
                              np.where(bvh.tri_offset >= 0,
                                       bvh.tri_offset // T, -1),
                              bvh.node_min, bvh.node_max,
                              dummy, dummy, dummy, leaf_size=1, width=8)
        jit_tlas = jax.jit(functools.partial(
            packet_traverse3, leaf_size=1,
            stack_depth=8 * (pk.depth + 2)))
        nodes_j = jnp.asarray(pk.nodes)
        leaves_j = jnp.asarray(pk.leaves)
        t_tlas = timed(lambda o, d, tm: jit_tlas(nodes_j, leaves_j, o, d, tm),
                       so, sd, stm, reps=5)
        probe = drain(jit_tlas(nodes_j, leaves_j, so, sd, stm))
        vis = np.asarray(probe.visits).reshape(-1, 128)[:, 0]

        # ---- C: exact pair statistics -------------------------------------
        pr, pl_, fv = frontier_pairs(bvh, o_np, d_np, tm_np, a_np, T)
        n_pairs = len(pr)
        groups = pr // 128                      # launch-order 128-lane walks
        walk_pairs = len(set(zip(groups.tolist(), pl_.tolist())))

        # ---- D: queue build (sort + ray row gather) at the real count ----
        P = int(np.ceil(n_pairs / 1024) * 1024)
        keys = jnp.asarray(np.random.default_rng(0).integers(
            0, n_tl, P, dtype=np.int32))
        lanes = jnp.asarray(np.random.default_rng(1).integers(
            0, nl, P, dtype=np.int32))
        rays7 = jnp.stack([so.x, so.y, so.z, sd.x, sd.y, sd.z, stm], -1)

        def build_queue(k, ln, r7):
            _, perm = jax.lax.sort((k, ln), num_keys=1, is_stable=False)
            return r7[perm]
        t_queue = timed(jax.jit(build_queue), keys, lanes, rays7, reps=5)

        # ---- E: dense MT at the real tile count ---------------------------
        n_tiles = P // 1024
        # treelet tl's T triangles = production leaf rows
        # [tl*T/8, (tl+1)*T/8) — the real table, real data (timing
        # stand-in: treelet count capped to the rows available)
        tri_rows = jnp.asarray(arrays.pk_leaves)
        n_tl_eff = min(n_tl, int(tri_rows.shape[0]) // (T // 8))
        tile_tl = jnp.asarray(np.random.default_rng(2).integers(
            0, n_tl_eff, (n_tiles, 1), dtype=np.int32))
        tile_rays = jnp.asarray(
            np.zeros((n_tiles, 7, 8, 128), np.float32) + 0.5)
        kern = functools.partial(dense_mt_kernel, T=T)
        dense = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(tri_rows.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 7, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        )
        jd = jax.jit(lambda a, b, c: dense(a, b, c))
        t_dense = timed(jd, tile_tl, tri_rows, tile_rays, reps=5)

        composed = t_tlas + t_queue + t_dense
        print(f"\n--- treelet T={T}: {n_tl} treelets, TLAS depth {pk.depth}")
        print(f"B TLAS walk                    {t_tlas * 1e3:8.2f} ms  "
              f"(visits/walk={vis.mean():.1f})")
        print(f"C pairs: lane-level={n_pairs} ({n_pairs / max(a_np.sum(),1):.1f}"
              f"/ray) walk-level={walk_pairs} frontier_visits={fv}")
        print(f"D queue build (sort+gather)    {t_queue * 1e3:8.2f} ms  "
              f"(P={P})")
        print(f"E dense MT ({n_tiles} tiles x {T} tris) "
              f"{t_dense * 1e3:8.2f} ms")
        print(f"=> composed two-level          {composed * 1e3:8.2f} ms "
              f"vs baseline {t_base * 1e3:.2f} ms  "
              f"{'GO' if composed < t_base * 0.8 else 'NO-GO'}")


if __name__ == "__main__":
    main()
