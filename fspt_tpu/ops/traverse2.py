"""Packet BVH traversal, kernel v2: extract-free node/leaf visits.

Round-2 profiling (scripts/perf_r3.py) measured ~580-780 ns per packet
visit against a 150-250 ns vector floor, with cost nearly independent of
packet height — i.e. the walk is dominated by per-visit SERIAL work, not by
the (rows, 128) slab/triangle math.  The v1 kernel's serial chain is mostly
56 vector->scalar element extracts per node visit (6 box floats x 8
children + 8 links from the fetched row) and 72 per leaf visit (9 floats x
8 triangles), each a vector-register-to-scalar-unit transfer.

v2 removes the scalar unit from the data path:

  * box/triangle constants come from (1, 1) lane slices of the fetched row,
    consumed by broadcasting arithmetic against the (rows, 128) ray planes —
    pure vector-domain shuffles, no scalar transfers;
  * links and the traversal axis live in separate SMEM int32 tables
    (computed once per call from the packed node rows), where dynamic
    scalar loads are native and cheap;
  * the descent vote stays 4 packed int32 lane-sum reductions, but its
    scalar unpack feeds shift/mask bit tests instead of float decode;
  * the push loop reads each child's link directly from SMEM by a
    dynamically reversed index (near-to-far order from the packet's
    dominant sign), so no reversal selects on vector data.

Same tables (ops/packing.py), same results, same PacketHit contract as v1
(ops/traverse.py) — cross-checked by tests/test_fastbvh.py.
Reference hot loop being replaced: /root/reference/shader/tracer.fs:366-404.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse import MAX_T, PacketHit, SENTINEL

EMPTY_I32 = np.int32(-(1 << 30))   # empty-child link in the SMEM table


def _packet_state(rays_ref, k, *, leaf_size, any_hit, rows):
    ox = rays_ref[k, 0 * rows:1 * rows]
    oy = rays_ref[k, 1 * rows:2 * rows]
    oz = rays_ref[k, 2 * rows:3 * rows]
    dx = rays_ref[k, 3 * rows:4 * rows]
    dy = rays_ref[k, 4 * rows:5 * rows]
    dz = rays_ref[k, 5 * rows:6 * rows]
    t_init = rays_ref[k, 6 * rows:7 * rows]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d < 0, -1e-20, 1e-20), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    # packet-dominant direction signs for near/far ordering (scalars)
    sx = (jnp.sum(dx) >= 0.0).astype(jnp.int32)
    sy = (jnp.sum(dy) >= 0.0).astype(jnp.int32)
    sz = (jnp.sum(dz) >= 0.0).astype(jnp.int32)

    def bc(row, i):
        # (1, 1) lane slice -> (1, 128) lane broadcast; the consuming
        # arithmetic then broadcasts sublanes.  Mosaic has no fused
        # both-dims broadcast ("Broadcast in both sublanes and lanes: not
        # implemented"), and XLA folds a bare broadcast_to into exactly
        # that, so an optimization_barrier pins the (1, 128) intermediate.
        # Stays in the vector domain — v1 extracted these through the
        # scalar unit, which profiling showed was the per-visit bottleneck.
        return jax.lax.optimization_barrier(
            jnp.broadcast_to(row[:, i:i + 1], (1, 128)))

    def aabb(row, c, best_t):
        mnx = bc(row, c)
        mny = bc(row, 8 + c)
        mnz = bc(row, 16 + c)
        mxx = bc(row, 24 + c)
        mxy = bc(row, 32 + c)
        mxz = bc(row, 40 + c)
        t1x = (mnx - ox) * ix
        t2x = (mxx - ox) * ix
        t1y = (mny - oy) * iy
        t2y = (mxy - oy) * iy
        t1z = (mnz - oz) * iz
        t2z = (mxz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.maximum(t1y, t2y)),
                           jnp.maximum(t1z, t2z))
        return (tmax >= tmin) & (tmax > 0.0) & (tmin < best_t)

    def mt(row, base, state, slot_base, j):
        best_t, best_slot, best_u, best_v = state
        c = [bc(row, base + i) for i in range(9)]
        px = dy * c[8] - dz * c[7]
        py = dz * c[6] - dx * c[8]
        pz = dx * c[7] - dy * c[6]
        det = c[3] * px + c[4] * py + c[5] * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
        tx = ox - c[0]
        ty = oy - c[1]
        tz = oz - c[2]
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * c[5] - tz * c[4]
        qy = tz * c[3] - tx * c[5]
        qz = tx * c[4] - ty * c[3]
        w = (dx * qx + dy * qy + dz * qz) * inv
        t = (c[6] * qx + c[7] * qy + c[8] * qz) * inv
        ok = ((jnp.abs(det) >= 1e-6) & (u >= 0.0) & (u <= 1.0)
              & (w >= 0.0) & (u + w <= 1.0) & (t > 1e-6) & (t < best_t))
        return (jnp.where(ok, t, best_t),
                jnp.where(ok, slot_base + j, best_slot),
                jnp.where(ok, u, best_u),
                jnp.where(ok, w, best_v))

    def make_step(nodes_ref, leaves_ref, links_ref, axis_ref, stack,
                  stack_depth):
        def leaf_branch(args):
            cur, ptr, bt, bs, bu, bv = args
            leaf = -cur - 1
            row = leaves_ref[pl.ds(leaf, 1), :]
            slot_base = leaf * leaf_size
            state = (bt, bs, bu, bv)
            for j in range(leaf_size):
                state = mt(row, 9 * j, state, slot_base, j)
            bt, bs, bu, bv = state
            nptr = ptr - 1
            ncur = stack[k, jnp.minimum(nptr, stack_depth - 1)]
            if any_hit:
                done = jnp.sum(jnp.where((bs >= 0) | (bt <= 0.0),
                                         1.0, 0.0)) >= bs.size
                ncur = jnp.where(done, SENTINEL, ncur)
                nptr = jnp.where(done, 0, nptr)
            return ncur, nptr, bt, bs, bu, bv

        def node_branch(args):
            cur, ptr, bt, bs, bu, bv = args
            row = nodes_ref[pl.ds(cur, 1), :]
            # packed any-lane vote: int32 lane sums, 2 children per
            # reduction (exact to 65535-lane packets)
            pair = [jnp.sum(aabb(row, 2 * i, bt).astype(jnp.int32)
                            + (aabb(row, 2 * i + 1, bt).astype(jnp.int32)
                               << 16))
                    for i in range(4)]
            wants = jnp.int32(0)      # bit c set iff child c wanted
            for i in range(4):
                lo = (pair[i] & 0xFFFF) > 0
                hi = (pair[i] >> 16) > 0
                lo = lo & (links_ref[cur, 2 * i] != EMPTY_I32)
                hi = hi & (links_ref[cur, 2 * i + 1] != EMPTY_I32)
                wants = (wants | (lo.astype(jnp.int32) << (2 * i))
                         | (hi.astype(jnp.int32) << (2 * i + 1)))
            axis = axis_ref[cur]
            fwd = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            p = ptr
            top = cur
            for j in range(8):
                cidx = jnp.where(fwd > 0, 7 - j, j)
                link_j = links_ref[cur, cidx]
                want_j = (wants >> cidx) & 1
                stack[k, jnp.minimum(p, stack_depth - 1)] = link_j
                top = jnp.where(want_j > 0, link_j, top)
                p = p + want_j
            nptr = p - 1
            popped = stack[k, jnp.minimum(nptr, stack_depth - 1)]
            ncur = jnp.where(p > ptr, top, popped)
            return ncur, nptr, bt, bs, bu, bv

        def step(st):
            cur, ptr, bt, bs, bu, bv, vis = st

            def active(args):
                return jax.lax.cond(args[0] < 0, leaf_branch, node_branch,
                                    args)

            out = jax.lax.cond(cur == SENTINEL,
                               lambda a: a, active,
                               (cur, ptr, bt, bs, bu, bv))
            vis = vis + jnp.where(cur == SENTINEL, 0, 1).astype(jnp.int32)
            return out + (vis,)

        return step

    zeros = jnp.zeros((rows, 128), jnp.float32)
    init = (jnp.int32(0), jnp.int32(1), t_init,
            jnp.full((rows, 128), -1, jnp.int32), zeros, zeros, jnp.int32(0))
    return init, make_step


def _traverse_kernel(links_ref, axis_ref, nodes_ref, leaves_ref, rays_ref,
                     t_ref, slot_ref, u_ref, v_ref, visits_ref, stack,
                     *, leaf_size: int, any_hit: bool, stack_depth: int,
                     interleave: int, rows: int):
    inits, steps = [], []
    for k in range(interleave):
        init, make_step = _packet_state(rays_ref, k, leaf_size=leaf_size,
                                        any_hit=any_hit, rows=rows)
        stack[k, 0] = SENTINEL
        inits.append(init)
        steps.append(make_step(nodes_ref, leaves_ref, links_ref, axis_ref,
                               stack, stack_depth))

    def cond(carry):
        alive = carry[0][0] != SENTINEL
        for k in range(1, interleave):
            alive = alive | (carry[k][0] != SENTINEL)
        return alive

    def body(carry):
        return tuple(steps[k](carry[k]) for k in range(interleave))

    out = jax.lax.while_loop(cond, body, tuple(inits))
    for k in range(interleave):
        cur, ptr, best_t, best_slot, best_u, best_v, visits = out[k]
        t_ref[k] = best_t
        slot_ref[k] = best_slot
        u_ref[k] = best_u
        v_ref[k] = best_v
        visits_ref[k] = jnp.full((rows, 128), visits, jnp.int32)


@functools.partial(jax.jit, static_argnames=("leaf_size", "any_hit",
                                             "stack_depth", "interpret",
                                             "interleave", "rows"))
def packet_traverse2(nodes, leaves, origin: V3, direction: V3, tmax=None, *,
                     leaf_size: int = 8, any_hit: bool = False,
                     stack_depth: int = 64,
                     interpret: bool = False,
                     interleave: int = 1,
                     rows: int = 8) -> PacketHit:
    """v2 traversal: same contract as ops/traverse.packet_traverse."""
    from fspt_tpu.ops.traverse import check_vmem_budget
    check_vmem_budget(nodes, leaves)
    n = origin.x.shape[0]
    packet = rows * 128
    group = interleave * packet
    n_pad = (-n) % group
    if tmax is None:
        tmax = jnp.full((n,), MAX_T, jnp.float32)

    def pad(a, value):
        if n_pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((n_pad,), value, a.dtype)], axis=0)

    npk = (n + n_pad) // packet

    def field(a, value):
        return pad(a, value).reshape(npk, rows, 128)

    rays = jnp.concatenate([
        field(origin.x, 1.0e9), field(origin.y, 1.0e9), field(origin.z, 1.0e9),
        field(direction.x, 0.0), field(direction.y, 1.0), field(direction.z, 0.0),
        field(tmax, 0.0),
    ], axis=1)

    # SMEM side tables, derived from the packed rows (cheap, fused by XLA)
    linkf = nodes[:, 48:56]
    links = jnp.where(linkf > -1.0e8, linkf.astype(jnp.int32), EMPTY_I32)
    axis = nodes[:, 56].astype(jnp.int32)

    kernel = functools.partial(_traverse_kernel, leaf_size=leaf_size,
                               any_hit=any_hit, stack_depth=stack_depth,
                               interleave=interleave, rows=rows)
    out_block = pl.BlockSpec((interleave, rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((npk, rows, 128), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((npk, rows, 128), jnp.int32)
    t, slot, u, v, visits = pl.pallas_call(
        kernel,
        grid=(npk // interleave,),
        in_specs=[
            pl.BlockSpec(links.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(axis.shape, lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(leaves.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((interleave, 7 * rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 5,
        out_shape=[out_shape, out_shape_i, out_shape, out_shape, out_shape_i],
        scratch_shapes=[pltpu.SMEM((interleave, stack_depth), jnp.int32)],
        interpret=interpret,
    )(links, axis, nodes, leaves, rays)

    flat = lambda a: a.reshape(-1)[:n]
    return PacketHit(t=flat(t), slot=flat(slot), u=flat(u), v=flat(v),
                     visits=flat(visits))
