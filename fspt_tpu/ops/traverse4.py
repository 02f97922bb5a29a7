"""Packet BVH traversal, kernel v4: phase-split, MULTI-POP multiwalk.

What actually bounds the v3 substep (measured, scripts/perf_r5d.py on
v5e): NOT the vector op count.  A fixed-iteration replay of the exact
substep structure shows a ~500 ns serial floor per substep — the
loop-carried vector->scalar extract + dynamic row fetch + advance chain —
under which the slab/MT vector work largely hides: removing the whole MT
block from the fused substep saves ~5%, per-child vote reductions ~2%,
software-pipelined or async-DMA fetches ~0 (round-4).  But K INDEPENDENT
fetch+test units in one substep amortize the floor: 1 unit = 714 ns,
2 = 456 ns/unit, 4 = 326 ns/unit.  The lever is therefore to give every
substep multiple independent work items per walk, not leaner code.

v4 restructures traversal around that:

  * node/leaf phase split: the stack holds INTERNAL links only; leaf
    wants go to a per-walk queue ((walks, qcap) VMEM, one-hot appends).
    Each while-body runs U node substeps or U drain substeps, chosen by
    one scalar vote on queue pressure — so each substep carries only its
    own code path AND has a homogeneous pool of independent work;
  * node substeps process `npop` nodes per walk (the current node plus
    pre-popped stack entries) as independent fetch+slab units with their
    own panel rows; push order preserves exact DFS semantics (deeper
    unit's children below);
  * drain substeps pop `lpop` queued leaves per walk as independent
    fetch+MT units;
  * per-4-children packed vote reductions (one cross-lane sum per 4
    children via 8-bit count fields) instead of one reduction per child.

Measured on the captured bounce-0 launch (362k lanes, 82k-tri bench
scene): v3 fused 57.6-59.0 ms -> v4 npop=2/lpop=2 46.3 ms (-20%), hit
results bit-identical (tests/test_fastbvh.py parity; walk visit counts
grow ~12% from best-hit feedback lagging a burst, already priced in).

Exactness: identical hits up to coplanar-tie order — wants are decided
against a bt that only shrinks, so a late leaf test is never wrong, only
occasionally redundant.  Unions, table layout (ops/packing.py) and the
PacketHit contract are unchanged.  Reference hot loop being replaced:
/root/reference/shader/tracer.fs:366-404 (per-thread stack + hardware-
scheduled divergence; the phase split + multi-pop is the TPU answer to
the latency-hiding a GPU warp scheduler provides for free).
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


def _walk4_kernel(n_nodes_ref, table_ref, rays_ref,
                  t_ref, slot_ref, u_ref, v_ref, visits_ref,
                  panel, stack, leafq, walk_state, *,
                  leaf_size: int, any_hit: bool, stack_depth: int,
                  table_rows: int, unroll: int, qcap: int,
                  drain_t: int = 0, drain_unroll: int = 0,
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

    # ---- node substep: descend npop nodes per walk, push node children,
    # queue leaf children.  The per-substep serial floor (~500 ns of
    # loop-carried scalar extract/fetch latency, scripts/perf_r5d.py)
    # amortizes over INDEPENDENT work units: unit 0 processes the walk's
    # current node, unit 1 the stack top (pre-popped), each with its own
    # panel rows so the fetch chains overlap.  Push order keeps exact DFS
    # semantics: unit-1 (farther) children below unit-0 children.
    def node_substep(st):
        cur, ptr, qlen, bt, bs, bu, bv, vis = st
        parked = (cur == SENTINEL).astype(jnp.int32)

        # unit nodes: [cur, stack top, stack top-1, ...] (pre-popped)
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

        is_node_u = [(u_ != SENTINEL).astype(jnp.int32) for u_ in units]
        for u, u_ in enumerate(units):
            sel = jnp.maximum(u_, 0) * is_node_u[u]
            for s in range(walks):
                panel[u * walks + s:u * walks + s + 1, :] = table_ref[
                    pl.ds(sel[s, 0], 1), :]

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
            # packed votes: one cross-lane reduction per 4 children (8-bit
            # count fields) instead of one per child (perf_r5d.py)
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
        q = qlen
        top = SENTINEL * jnp.ones_like(p)
        pushed = jnp.zeros_like(p)
        # farthest unit's children pushed first (deepest unit = farther in
        # DFS order), each unit's children far -> near: exact DFS order
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
        for u in range(npop):
            vis = vis + is_node_u[u]
        return ncur, nptr, q, bt, bs, bu, bv, vis

    # ---- drain substep: pop the lpop newest queued leaves per walk, MT
    # their triangles as independent fetch+test units (same serial-floor
    # amortization: 4 units measured ~326 ns each vs ~714 solo) ----------
    def drain_substep(st):
        cur, ptr, qlen, bt, bs, bu, bv, vis = st
        has = []
        ords = []
        for u in range(lpop):
            h = (qlen > u).astype(jnp.int32)
            qtop = jnp.clip(qlen - 1 - u, 0, qcap - 1)
            link = jnp.sum(jnp.where(q_iota == qtop, leafq[:, :], 0),
                           axis=1, keepdims=True)
            has.append(h)
            ords.append(jnp.maximum(-link - 1, 0))
        for u in range(lpop):
            sel = jnp.maximum(W + ords[u], 0) * has[u]
            for s in range(walks):
                panel[u * walks + s:u * walks + s + 1, :] = table_ref[
                    pl.ds(sel[s, 0], 1), :]
        for u in range(lpop):
            off = u * walks

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
        taken = jnp.minimum(qlen, lpop)
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
    # drain when a burst's worth of leaves is queued, before a node burst
    # could overflow any queue, or when node work is exhausted
    if drain_t <= 0:
        drain_t = max(unroll * walks * lpop // 2, walks * lpop)
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
        drain = ((total_q >= drain_t)
                 | (max_q + tw * unroll * npop > qcap)
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
                st = node_substep(st)
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
                                             "tree_width", "drain_t",
                                             "drain_unroll", "npop",
                                             "lpop"))
def packet_traverse4(nodes, leaves, origin: V3, direction: V3, tmax=None, *,
                     leaf_size: int = 8, any_hit: bool = False,
                     stack_depth: int = 64,
                     interpret: bool = False,
                     unroll: int = 6, qcap: int = 128,
                     drain_t: int = 0, drain_unroll: int = 4,
                     npop: int = 2, lpop: int = 2,
                     walks: int = WALKS, tree_width: int = 8) -> PacketHit:
    """v4 phase-split multiwalk traversal: same contract as
    ops/traverse3.packet_traverse3 (visits = per-128-ray-walk node+leaf
    fetch count, matching v3's semantics)."""
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

    kernel = functools.partial(_walk4_kernel, leaf_size=leaf_size,
                               any_hit=any_hit, stack_depth=stack_depth,
                               table_rows=int(table.shape[0]),
                               unroll=unroll, qcap=qcap, drain_t=drain_t,
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
            pltpu.VMEM((max(npop, lpop) * walks, LANES),
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
