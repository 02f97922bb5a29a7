"""Packet BVH traversal, kernel v5 PROTOTYPE: MIXED multi-pop substeps.

MEASURED NO-GO (scripts/perf_r5i.py, captured bounce-0 launch, v5e):
v4 43.9 ms vs v5 46.8-61.8 ms across the (npop, lpop, unroll) sweep,
hits bit-identical (slot_match=1.0).  Why the unit-amortization model
fails here: leaves drain as fast as node substeps produce them, so the
queue is near-empty most of the time — the lpop drain units run MASKED
(wasted fetch slots AND un-hidden MT vector work) on most substeps,
while the substep count barely drops because node descent, not leaf
testing, dominates the visit mix (visits/walk 104.9 mixed vs 109.9
phase-split).  Mixed substeps only pay when both pools are reliably
full; v4's pressure-voted bursts already keep drain substeps full.
Kept under scripts/ as evidence; not part of the package.

v4 (ops/traverse4.py) phase-splits traversal into node bursts and drain
bursts, each substep carrying npop=2 / lpop=2 independent fetch+test
units.  The measured substep cost curve (scripts/perf_r5d.py, v5e) says
the ~500 ns loop-carried serial floor amortizes over independent units
almost linearly past two: 1 unit = 714 ns, 2 = 456 ns/unit,
4 = 326 ns/unit.  v4 stops at 2 units per substep because more same-kind
units couple: node units share one stack (pre-pop chains serialize) and
drain units share one queue (imbalance starves units).

v5 gets to 4+ independent units per substep WITHOUT deepening either
coupled pool: each substep runs the npop node units AND the lpop drain
units together.  The two pools touch disjoint state, so their fetch
chains overlap fully:

  * drain selections (which queued leaves to test) read the queue at
    substep ENTRY; `taken = min(qlen, lpop)` is pure arithmetic on entry
    state, so neither drain fetches nor the append cursor depend on this
    substep's node results;
  * node units descend exactly as v4 (pre-popped stack entries, packed
    per-4-child votes, exact DFS push order), with leaf appends starting
    at `qlen - taken` — the slots drain just consumed — so the queue
    stays dense with no ring buffer;
  * drain MT updates best-t after node wants were decided (one-substep
    staleness, same as v4's burst alternation): a late want is never
    wrong, only occasionally redundant, so hits are identical up to
    coplanar-tie order;
  * when the queue is empty the drain units are masked no-ops whose row
    fetch (row 0) still overlaps; when a walk is parked its node units
    mask the same way.  A scalar burst vote falls back to PURE drain
    substeps (npop+lpop units wide, using the whole fetch panel) when a
    queue risks overflow or node work is exhausted.

Measured on the captured bounce-0 launch (362k lanes, 82k-tri bench
scene): v4 46.3 ms -> v5 npop=2/lpop=2 (see scripts/perf_r5i.py for the
sweep).  Contract identical to v4/v3: PacketHit with per-walk visit
counts.  Reference hot loop being replaced:
/root/reference/shader/tracer.fs:366-404.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu.core.vec import V3
from fspt_tpu.ops.traverse import MAX_T, SENTINEL, PacketHit, check_vmem_budget

WALKS = 8
LANES = 128


def _walk5_kernel(n_nodes_ref, table_ref, rays_ref,
                  t_ref, slot_ref, u_ref, v_ref, visits_ref,
                  panel, stack, leafq, walk_state, *,
                  leaf_size: int, any_hit: bool, stack_depth: int,
                  table_rows: int, unroll: int, qcap: int,
                  drain_unroll: int = 0,
                  npop: int = 2, lpop: int = 2,
                  walks: int = WALKS, tree_width: int = 8):
    W = n_nodes_ref[0]
    tw = tree_width
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    t_init = rays_ref[0, 6]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d < 0, -1e-20, 1e-20), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    sx = (jnp.sum(dx, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)
    sy = (jnp.sum(dy, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)
    sz = (jnp.sum(dz, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)

    stack_iota = jax.lax.broadcasted_iota(jnp.int32, (walks, stack_depth), 1)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (walks, qcap), 1)

    def lanes(a):
        return jnp.broadcast_to(a, (walks, LANES))

    # ---- drain machinery (shared by mixed and pure-drain substeps):
    # select k queued leaves from ENTRY state, fetch into panel rows
    # [panel_off, panel_off + k*walks), MT them ------------------------
    def drain_select(qlen, k):
        has, ords = [], []
        for u in range(k):
            h = (qlen > u).astype(jnp.int32)
            qtop = jnp.clip(qlen - 1 - u, 0, qcap - 1)
            link = jnp.sum(jnp.where(q_iota == qtop, leafq[:, :], 0),
                           axis=1, keepdims=True)
            has.append(h)
            ords.append(jnp.maximum(-link - 1, 0))
        return has, ords

    def drain_fetch(has, ords, panel_off):
        for u in range(len(has)):
            sel = jnp.maximum(W + ords[u], 0) * has[u]
            base = (panel_off + u) * walks
            for s in range(walks):
                panel[base + s:base + s + 1, :] = table_ref[
                    pl.ds(sel[s, 0], 1), :]

    def drain_mt(has, ords, panel_off, bt, bs, bu, bv):
        for u in range(len(has)):
            off = (panel_off + u) * walks

            def rd(a, b, off=off):
                return panel[off:off + walks, a:b]

            slot_base = ords[u] * leaf_size
            leaf_mask = jnp.broadcast_to(has[u], (walks, LANES)) > 0
            for j in range(leaf_size):
                b = 9 * j
                c = [rd(b + i, b + i + 1) for i in range(9)]
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
                ok = (leaf_mask
                      & (jnp.abs(det) >= 1e-6)
                      & (uu >= 0.0) & (uu <= 1.0) & (ww >= 0.0)
                      & (uu + ww <= 1.0) & (tt > 1e-6) & (tt < bt))
                bt = jnp.where(ok, tt, bt)
                bs = jnp.where(ok, slot_base + j, bs)
                bu = jnp.where(ok, uu, bu)
                bv = jnp.where(ok, ww, bv)
        return bt, bs, bu, bv

    # ---- node machinery (as v4): pre-pop npop units, slab votes, exact
    # DFS pushes; leaf appends start at the caller-provided cursor -------
    def node_units(cur, ptr):
        units = [cur]
        p0 = ptr
        for u in range(1, npop):
            pop_at = jnp.clip(p0 - 1, 0, stack_depth - 1)
            popped = jnp.sum(jnp.where(stack_iota == pop_at, stack[:, :], 0),
                             axis=1, keepdims=True)
            popped = jnp.where((p0 >= 2) & (cur != SENTINEL), popped,
                               SENTINEL)
            p0 = jnp.where(popped != SENTINEL, p0 - 1, p0)
            units.append(popped)
        return units, p0

    def node_fetch(units, is_node_u):
        for u, u_ in enumerate(units):
            sel = jnp.maximum(u_, 0) * is_node_u[u]
            for s in range(walks):
                panel[u * walks + s:u * walks + s + 1, :] = table_ref[
                    pl.ds(sel[s, 0], 1), :]

    def node_expand(units, is_node_u, p0, q_start, bt, parked):
        def unit_wants(u):
            off = u * walks

            def rd(a, b):
                return panel[off:off + walks, a:b]

            def child_box(c):
                t1x = (rd(c, c + 1) - ox) * ix
                t2x = (rd(3 * tw + c, 3 * tw + c + 1) - ox) * ix
                t1y = (rd(tw + c, tw + c + 1) - oy) * iy
                t2y = (rd(4 * tw + c, 4 * tw + c + 1) - oy) * iy
                t1z = (rd(2 * tw + c, 2 * tw + c + 1) - oz) * iz
                t2z = (rd(5 * tw + c, 5 * tw + c + 1) - oz) * iz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                               jnp.maximum(t1y, t2y)),
                                   jnp.maximum(t1z, t2z))
                return (tmax >= tmin) & (tmax > 0.0) & (tmin < bt)

            links = [rd(6 * tw + c, 6 * tw + c + 1) for c in range(tw)]
            packs = []
            for group in range(0, tw, 4):
                acc = None
                for c in range(group, min(group + 4, tw)):
                    m = child_box(c).astype(jnp.int32) << (8 * (c - group))
                    acc = m if acc is None else acc + m
                packs.append(jnp.sum(acc, axis=1, keepdims=True))
            wants = []
            for c in range(tw):
                cnt = (packs[c // 4] >> (8 * (c % 4))) & 255
                any_c = (cnt > 0).astype(jnp.int32)
                valid_c = (links[c] > -1.0e8).astype(jnp.int32)
                wants.append(any_c * valid_c * is_node_u[u])
            axis = rd(7 * tw, 7 * tw + 1)
            fwd = jnp.where(axis == 0.0, sx, jnp.where(axis == 1.0, sy, sz))
            return links, wants, fwd

        per_unit = [unit_wants(u) for u in range(npop)]

        p = p0
        q = q_start
        top = SENTINEL * jnp.ones_like(p)
        pushed = jnp.zeros_like(p)
        for u in range(npop - 1, -1, -1):
            links, wants, fwd = per_unit[u]
            for j in range(tw):
                link_j = jnp.where(fwd > 0, links[tw - 1 - j],
                                   links[j]).astype(jnp.int32)
                want_j = jnp.where(fwd > 0, wants[tw - 1 - j], wants[j])
                is_leaf_j = (link_j < 0).astype(jnp.int32)
                push_j = want_j * (1 - is_leaf_j)
                app_j = want_j * is_leaf_j
                write = (stack_iota == p) & (jnp.broadcast_to(
                    push_j, (walks, stack_depth)) > 0)
                stack[:, :] = jnp.where(write, jnp.broadcast_to(
                    link_j, (walks, stack_depth)), stack[:, :])
                qwrite = (q_iota == q) & (jnp.broadcast_to(
                    app_j, (walks, qcap)) > 0)
                leafq[:, :] = jnp.where(qwrite, jnp.broadcast_to(
                    link_j, (walks, qcap)), leafq[:, :])
                top = jnp.where(push_j > 0, link_j, top)
                pushed = jnp.maximum(pushed, push_j)
                p = p + push_j
                q = q + app_j

        nptr = p - 1
        pop_at = jnp.clip(nptr, 0, stack_depth - 1)
        popped = jnp.sum(jnp.where(stack_iota == pop_at, stack[:, :], 0),
                         axis=1, keepdims=True)
        ncur = jnp.where(pushed > 0, top, popped)
        ncur = jnp.where(parked > 0, SENTINEL, ncur)
        nptr = jnp.where((parked > 0) | (ncur == SENTINEL), 0, nptr)
        return ncur, nptr, q

    # ---- the v5 substep: npop node units + lpop drain units, all
    # independent at the fetch level -----------------------------------
    def mixed_substep(st):
        cur, ptr, qlen, bt, bs, bu, bv, vis = st
        parked = (cur == SENTINEL).astype(jnp.int32)

        has, ords = drain_select(qlen, lpop)          # entry state only
        taken = jnp.minimum(qlen, lpop)
        units, p0 = node_units(cur, ptr)
        is_node_u = [(u_ != SENTINEL).astype(jnp.int32) for u_ in units]

        # issue every fetch before any compute: npop + lpop independent
        # dynamic-row chains for Mosaic to overlap
        node_fetch(units, is_node_u)
        drain_fetch(has, ords, npop)

        ncur, nptr, q_after = node_expand(units, is_node_u, p0,
                                          qlen - taken, bt, parked)
        bt, bs, bu, bv = drain_mt(has, ords, npop, bt, bs, bu, bv)

        nqlen = q_after
        for u in range(npop):
            vis = vis + is_node_u[u]
        vis = vis + taken
        if any_hit:
            done = jnp.sum(((bs >= 0) | (bt <= 0.0)).astype(jnp.float32),
                           axis=1, keepdims=True) >= float(LANES)
            ncur = jnp.where(done, SENTINEL, ncur)
            nptr = jnp.where(done, 0, nptr)
            nqlen = jnp.where(done, 0, nqlen)
        return ncur, nptr, nqlen, bt, bs, bu, bv, vis

    # ---- pure drain substep (overflow / endgame): npop+lpop units wide
    def drain_substep(st):
        cur, ptr, qlen, bt, bs, bu, bv, vis = st
        k = npop + lpop
        has, ords = drain_select(qlen, k)
        drain_fetch(has, ords, 0)
        bt, bs, bu, bv = drain_mt(has, ords, 0, bt, bs, bu, bv)
        taken = jnp.minimum(qlen, k)
        nqlen = qlen - taken
        ncur = cur
        nptr = ptr
        if any_hit:
            done = jnp.sum(((bs >= 0) | (bt <= 0.0)).astype(jnp.float32),
                           axis=1, keepdims=True) >= float(LANES)
            ncur = jnp.where(done, SENTINEL, ncur)
            nptr = jnp.where(done, 0, nptr)
            nqlen = jnp.where(done, 0, nqlen)
        vis = vis + taken
        return ncur, nptr, nqlen, bt, bs, bu, bv, vis

    max_steps = 8 * (table_rows + 64)
    if drain_unroll <= 0:
        drain_unroll = unroll

    def load_state():
        return (walk_state[0:walks, 0:1].astype(jnp.int32),
                walk_state[walks:2 * walks, 0:1].astype(jnp.int32),
                walk_state[2 * walks:3 * walks, 0:1].astype(jnp.int32),
                t_ref[0], slot_ref[0], u_ref[0], v_ref[0],
                visits_ref[0][:, 0:1])

    def store_state(st):
        cur, ptr, qlen, bt, bs, bu, bv, vis = st
        walk_state[0:walks, :] = lanes(cur)
        walk_state[walks:2 * walks, :] = lanes(ptr)
        walk_state[2 * walks:3 * walks, :] = lanes(qlen)
        visits_ref[0] = lanes(vis)
        t_ref[0] = bt
        slot_ref[0] = bs
        u_ref[0] = bu
        v_ref[0] = bv

    def body(go):
        st = load_state()
        cur, ptr, qlen = st[0], st[1], st[2]
        total_q = jnp.sum(qlen)
        max_q = jnp.max(qlen)
        node_alive = jnp.sum((cur != SENTINEL).astype(jnp.int32))
        # a mixed burst appends at most tw*npop and drains at least
        # min(qlen, lpop) per substep; vote pure drain when the bound
        # could overflow, or node work is done but leaves remain
        drain = ((max_q + tw * unroll * npop > qcap)
                 | ((node_alive == 0) & (total_q > 0)))

        @pl.when(drain)
        def _():
            st = load_state()
            for _ in range(drain_unroll):
                st = drain_substep(st)
            store_state(st)

        @pl.when(jnp.logical_not(drain))
        def _():
            st = load_state()
            for _ in range(unroll):
                st = mixed_substep(st)
            store_state(st)

        cur = walk_state[0:walks, 0:1].astype(jnp.int32)
        qlen = walk_state[2 * walks:3 * walks, 0:1].astype(jnp.int32)
        vis = visits_ref[0][:, 0:1]
        keep = lanes(((cur != SENTINEL) | (qlen > 0)).astype(jnp.int32)
                     * (vis < max_steps).astype(jnp.int32))
        return jnp.sum(keep)

    ione = lambda v: jnp.full((walks, LANES), v, jnp.int32)
    walk_state[0:walks, :] = ione(0)           # cur = root
    walk_state[walks:2 * walks, :] = ione(1)   # ptr = 1 (bottom guard)
    walk_state[2 * walks:3 * walks, :] = ione(0)   # qlen = 0
    visits_ref[0] = ione(0)
    t_ref[0] = t_init
    slot_ref[0] = jnp.full((walks, LANES), -1, jnp.int32)
    u_ref[0] = jnp.zeros((walks, LANES), jnp.float32)
    v_ref[0] = jnp.zeros((walks, LANES), jnp.float32)
    stack[:, 0:1] = jnp.full((walks, 1), SENTINEL, jnp.int32)
    jax.lax.while_loop(lambda go: go > 0, body, jnp.int32(1))


@functools.partial(jax.jit, static_argnames=("leaf_size", "any_hit",
                                             "stack_depth", "interpret",
                                             "unroll", "qcap", "walks",
                                             "tree_width",
                                             "drain_unroll", "npop",
                                             "lpop"))
def packet_traverse5(nodes, leaves, origin: V3, direction: V3, tmax=None, *,
                     leaf_size: int = 8, any_hit: bool = False,
                     stack_depth: int = 64,
                     interpret: bool = False,
                     unroll: int = 4, qcap: int = 128,
                     drain_unroll: int = 4,
                     npop: int = 2, lpop: int = 2,
                     walks: int = WALKS, tree_width: int = 8) -> PacketHit:
    """v5 mixed multi-pop traversal: same contract as
    ops/traverse4.packet_traverse4 (visits = per-128-ray-walk node+leaf
    fetch count)."""
    check_vmem_budget(nodes, leaves)
    n = origin.x.shape[0]
    group = walks * LANES
    n_pad = (-n) % group
    if tmax is None:
        tmax = jnp.full((n,), MAX_T, jnp.float32)

    def pad(a, value):
        if n_pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((n_pad,), value, a.dtype)], axis=0)

    npg = (n + n_pad) // group

    def field(a, value):
        return pad(a, value).reshape(npg, 1, walks, LANES)

    rays = jnp.concatenate([
        field(origin.x, 1.0e9), field(origin.y, 1.0e9), field(origin.z, 1.0e9),
        field(direction.x, 0.0), field(direction.y, 1.0), field(direction.z, 0.0),
        field(tmax, 0.0),
    ], axis=1)                                     # (npg, 7, 8, 128)

    table = jnp.concatenate([nodes, leaves], axis=0)
    n_nodes = jnp.full((1,), nodes.shape[0], jnp.int32)

    kernel = functools.partial(_walk5_kernel, leaf_size=leaf_size,
                               any_hit=any_hit, stack_depth=stack_depth,
                               table_rows=int(table.shape[0]),
                               unroll=unroll, qcap=qcap,
                               drain_unroll=drain_unroll, npop=npop,
                               lpop=lpop, walks=walks,
                               tree_width=tree_width)
    out_block = pl.BlockSpec((1, walks, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((npg, walks, LANES), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((npg, walks, LANES), jnp.int32)
    t, slot, u, v, visits = pl.pallas_call(
        kernel,
        grid=(npg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, walks, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 5,
        out_shape=[out_shape, out_shape_i, out_shape, out_shape, out_shape_i],
        scratch_shapes=[
            pltpu.VMEM(((npop + lpop) * walks, LANES),
                       jnp.float32),                      # per-unit panels
            pltpu.VMEM((walks, stack_depth), jnp.int32),  # node stack
            pltpu.VMEM((walks, qcap), jnp.int32),         # leaf queue
            pltpu.VMEM((3 * walks, LANES), jnp.int32),    # cur/ptr/qlen
        ],
        interpret=interpret,
    )(n_nodes, table, rays)

    flat = lambda a: a.reshape(-1)[:n]
    return PacketHit(t=flat(t), slot=flat(slot), u=flat(u), v=flat(v),
                     visits=flat(visits))
