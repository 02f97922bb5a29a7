"""Packet BVH traversal, kernel v3: eight vectorized walks per program.

Why v1 is slow (measured, scripts/perf_r3.py): one packet of 1024 rays
walks the wide BVH with ~580-830 ns of SERIAL per-visit work (row fetch,
56 vector->scalar extracts, 4 cross-lane vote reductions, 8 scalar stack
pushes) against a 150-250 ns vector floor — and for incoherent bounce rays
the 1024-ray node-set union is ~7x a single ray's need, so ~93% of the
slab/triangle tests are wasted on lanes that don't want the node.  Making
packets taller amortizes no better; narrower per-walk unions are where the
work reduction is, IF the per-visit serial cost can be paid once for MANY
walks.

v3 restructures the kernel so the serial cost is shared by 8 walks:

  * a program advances EIGHT independent 128-ray walks in lockstep; walk
    s's rays live in the 128 lanes of sublane s, so every (8, 128) vector
    op tests 8 walks x 128 rays at full VPU occupancy;
  * per-walk traversal state (current node, stack pointer, direction
    signs, votes) is (8, 1) VECTORS, not scalars: descent decisions,
    near/far ordering, and bookkeeping are lane-broadcast arithmetic;
  * per-walk stacks are rows of an (8, depth) VMEM scratch updated with
    one-hot writes (iota == ptr selects) and popped with one-hot
    lane-reductions — no per-lane addressing needed;
  * node and leaf rows live in ONE unified (W + L, 128) table so each
    super-step does exactly 8 dynamic row fetches (the only remaining
    scalar work: extracting 8 row indices);
  * votes are lane-reductions to (8, 1) — they never leave the vector
    domain.

Mosaic layout constraint (measured on v5e): vector while-loop carries
whose replicated-layout init must unify with a lane-replicated "{0,*}"
body result fail to compile ("Invalid relayout: non-singleton logical
dimension is replicated in destination but not in source", for both
(8, 1) and (8, 128) i32 carries).  So the loop carries ONE scalar
continue-flag and nothing else: all vector walk state is loaded from VMEM
(walk-state scratch + output refs) once per loop body, advanced `unroll`
visits in registers, and stored back once per body.  The cross-lane
continue reduction is likewise paid once per `unroll` visits.

A walk visits only the union of ITS 128 rays' node sets (~6x smaller than
a 1024-ray union on sorted bounce rays), and the whole visit pipeline is
vector work.  Same packed tables (ops/packing.py), same PacketHit
contract, bit-identical results (tests/test_fastbvh.py cross-checks).
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
from fspt_tpu.ops.traverse import MAX_T, SENTINEL, PacketHit, check_vmem_budget

WALKS = 8          # sublanes = independent 128-ray walks per program
LANES = 128


def _walk_kernel(n_nodes_ref, table_ref, rays_ref,
                 t_ref, slot_ref, u_ref, v_ref, visits_ref,
                 panel, stack, walk_state, *extra,
                 leaf_size: int, any_hit: bool, stack_depth: int,
                 table_rows: int, unroll: int, stage: str,
                 walks: int = WALKS, tree_width: int = 8,
                 lane_counts: bool = False):
    dma_sems = table_vmem = hbm_sem = None
    if stage == "dma":
        (dma_sems,) = extra
    elif stage in ("hbm", "condh"):
        table_vmem, hbm_sem = extra
        # the table input lives in HBM; copy it ONCE into a VMEM scratch
        # that persists across sequential grid programs — testing whether
        # the whole-table VMEM BlockSpec pays a per-program re-copy
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(table_ref, table_vmem, hbm_sem)
            cp.start()
            cp.wait()
        table_ref = table_vmem
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
    # per-walk dominant direction signs, (8, 1) int32 vectors (narrow bool
    # vectors trip Mosaic's i8->i1 truncation, so logical walk state is
    # int32 arithmetic throughout)
    sx = (jnp.sum(dx, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)
    sy = (jnp.sum(dy, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)
    sz = (jnp.sum(dz, axis=1, keepdims=True) >= 0.0).astype(jnp.int32)

    stack_iota = jax.lax.broadcasted_iota(jnp.int32, (walks, stack_depth), 1)

    def lanes(a):
        return jnp.broadcast_to(a, (walks, LANES))

    def sel_of(cur):
        """Row index each walk's current node/leaf lives at (parked -> 0)."""
        parked = (cur == SENTINEL).astype(jnp.int32)
        is_leaf = ((cur < 0).astype(jnp.int32)) * (1 - parked)
        is_node = (cur >= 0).astype(jnp.int32)
        return jnp.maximum(is_node * cur + is_leaf * (W + (-cur - 1)), 0)

    def node_advance(cur, ptr, bt, rd, parked, is_node, cond_skip=False):
        """Slab-test the tw children, vote, push wanted links, pop: the
        walk's next (cur, ptr).  For leaf visits (is_node == 0) no child is
        wanted, so this reduces to the stack pop — the advance is uniform.
        cond_skip: branch around the child slab tests entirely when no walk
        in the program is at a node this visit (lax.cond on the scalar
        unit; the push/pop bookkeeping is cheap and always runs)."""
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

        def compute_wants():
            # ONE cross-lane reduction per 4 children instead of one per
            # child: pack each child's hit mask into an 8-bit field (lane
            # counts <= 128 fit), sum across lanes once, then unpack the
            # per-child any-votes from the field counts.  The per-child
            # lane reductions were the critical path of the whole substep
            # (scripts/perf_r5d.py: the slab+vote+stack chain is ~1.18 us
            # of the 1.24 us substep while fetch+MT hide beneath it).
            packs = []
            for group in range(0, tw, 4):
                acc = None
                for c in range(group, min(group + 4, tw)):
                    m = child_box(c).astype(jnp.int32) << (8 * (c - group))
                    acc = m if acc is None else acc + m
                packs.append(jnp.sum(acc, axis=1, keepdims=True))
            out = []
            for c in range(tw):
                cnt = (packs[c // 4] >> (8 * (c % 4))) & 255
                any_c = (cnt > 0).astype(jnp.int32)
                valid_c = (links[c] > -1.0e8).astype(jnp.int32)
                out.append(any_c * valid_c * is_node)
            return tuple(out)

        if cond_skip:
            wants = jax.lax.cond(
                jnp.sum(is_node) > 0, compute_wants,
                lambda: tuple(jnp.zeros((walks, 1), jnp.int32)
                              for _ in range(tw)))
        else:
            wants = compute_wants()

        axis = rd(7 * tw, 7 * tw + 1)
        fwd = jnp.where(axis == 0.0, sx, jnp.where(axis == 1.0, sy, sz))

        p = ptr
        top = cur
        pushed = jnp.zeros_like(p)
        for j in range(tw):
            link_j = jnp.where(fwd > 0, links[tw - 1 - j],
                               links[j]).astype(jnp.int32)
            want_j = jnp.where(fwd > 0, wants[tw - 1 - j], wants[j])
            write = (stack_iota == p) & (jnp.broadcast_to(
                want_j, (walks, stack_depth)) > 0)
            stack[:, :] = jnp.where(write, jnp.broadcast_to(
                link_j, (walks, stack_depth)), stack[:, :])
            top = jnp.where(want_j > 0, link_j, top)
            pushed = jnp.maximum(pushed, want_j)
            p = p + want_j

        nptr = p - 1
        pop_at = jnp.clip(nptr, 0, stack_depth - 1)
        popped = jnp.sum(jnp.where(stack_iota == pop_at, stack[:, :], 0),
                         axis=1, keepdims=True)
        ncur = jnp.where(pushed > 0, top, popped)
        ncur = jnp.where(parked > 0, SENTINEL, ncur)
        nptr = jnp.where((parked > 0) | (ncur == SENTINEL), 0, nptr)
        return ncur, nptr

    def leaf_tests(cur, rd, is_leaf, bt, bs, bu, bv):
        """Moller-Trumbore the walk's leaf_size tris against its 128 rays."""
        leaf_ord = -cur - 1
        slot_base = leaf_ord * leaf_size
        leaf_mask = jnp.broadcast_to(is_leaf, (walks, LANES)) > 0
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

    def _dma(buf, s, idx):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, 1), :],
            panel.at[buf, pl.ds(s, 1), :],
            dma_sems.at[buf, s])

    def substep_pipe(st, j):
        """Software-pipelined visit: the next visit's row fetch is issued
        between this visit's node-advance (which determines the next node)
        and its leaf intersection tests, so the fetch overlaps the leaf
        vector math instead of serializing ahead of it.  Exact: a walk is
        at either a node or a leaf per visit, so this visit's bt updates
        (leaf branch) can never feed its own descent vote (node branch).
        stage "pipe" uses plain copies into the single panel (the row value
        is materialized to registers first); stage "dma" double-buffers the
        panel and uses explicit async DMA with per-(buffer, walk) semaphores
        — waits for buffer j%2 at visit start, starts fetches into the
        other buffer as soon as the next node is known."""
        cur, ptr, bt, bs, bu, bv, vis = st
        parked = (cur == SENTINEL).astype(jnp.int32)
        is_leaf = ((cur < 0).astype(jnp.int32)) * (1 - parked)
        is_node = (cur >= 0).astype(jnp.int32)
        cond_skip = stage in ("cond", "condh")
        if stage == "dma":
            buf = j % 2
            cur_sel = sel_of(cur)
            for s in range(walks):
                _dma(buf, s, cur_sel[s, 0]).wait()
            row = panel[buf, :, :]
        else:
            row = panel[:, :]
        # memoized lane slices: the node branch's 57 positions are a
        # subset of the leaf branch's 72 (both read row[:, a:a+1] by
        # static offset), so deduping at trace time guarantees each (8,1)
        # extract+broadcast is emitted once instead of ~129 times
        cache = {}

        def rd(a, b):
            if (a, b) not in cache:
                cache[(a, b)] = row[:, a:b]
            return cache[(a, b)]

        ncur, nptr = node_advance(cur, ptr, bt, rd, parked, is_node,
                                  cond_skip=cond_skip)
        nsel = sel_of(ncur)
        idxs = [nsel[s, 0] for s in range(walks)]
        if stage == "dma":
            for s in range(walks):
                _dma(1 - (j % 2), s, idxs[s]).start()
        else:
            for s in range(walks):
                panel[s:s + 1, :] = table_ref[pl.ds(idxs[s], 1), :]

        if cond_skip:
            bt, bs, bu, bv = jax.lax.cond(
                jnp.sum(is_leaf) > 0,
                lambda: leaf_tests(cur, rd, is_leaf, bt, bs, bu, bv),
                lambda: (bt, bs, bu, bv))
        else:
            bt, bs, bu, bv = leaf_tests(cur, rd, is_leaf, bt, bs, bu, bv)
        if any_hit:
            # prefetched rows for done-overridden walks go unused (their
            # walk parks); the wait descriptor only needs matching shape
            done = jnp.sum(((bs >= 0) | (bt <= 0.0)).astype(jnp.float32),
                           axis=1, keepdims=True) >= float(LANES)
            ncur = jnp.where(done, SENTINEL, ncur)
            nptr = jnp.where(done, 0, nptr)
        vis = vis + (1 - parked)
        return ncur, nptr, bt, bs, bu, bv, vis

    def substep(st):
        cur, ptr, bt, bs, bu, bv, vis = st       # registers, no VMEM state
        parked = (cur == SENTINEL).astype(jnp.int32)          # (8, 1)
        is_leaf = ((cur < 0).astype(jnp.int32)) * (1 - parked)
        is_node = (cur >= 0).astype(jnp.int32)
        leaf_ord = -cur - 1
        sel = is_node * cur + is_leaf * (W + leaf_ord)
        sel = jnp.maximum(sel, 0)
        # per-walk dynamic row reads into the panel scratch — the only
        # scalar work.  All vector->scalar index extracts are issued before
        # any copy so the 8 independent fetch chains can pipeline instead
        # of serializing extract->copy->extract->copy.
        idxs = [sel[s, 0] for s in range(walks)]
        if stage == "fixedidx":
            # DIAGNOSTIC ONLY (wrong results): constant row index isolates
            # the vector->scalar extract + dynamic-address cost from the
            # VMEM copy cost.
            for s in range(walks):
                panel[s:s + 1, :] = table_ref[pl.ds(s, 1), :]
            row = panel[:, :]
            rd = lambda a, b: row[:, a:b]
        elif stage == "noscalar":
            # DIAGNOSTIC ONLY (wrong results): skip the fetch entirely —
            # measures the pure vector pipeline + loop machinery.
            row = panel[:, :]
            rd = lambda a, b: row[:, a:b]
        elif stage == "direct":
            # no panel round-trip: concatenate the fetched rows in registers
            row = jnp.concatenate(
                [table_ref[pl.ds(idxs[s], 1), :] for s in range(walks)],
                axis=0)
            rd = lambda a, b: row[:, a:b]
        elif stage in ("value", "hbm"):
            for s in range(walks):
                panel[s:s + 1, :] = table_ref[pl.ds(idxs[s], 1), :]
            row = panel[:, :]
            rd = lambda a, b: row[:, a:b]
        else:
            # slice straight from the scratch ref: ~70 tiny (8, 1) VMEM
            # loads instead of lane-rotations of a materialized register
            for s in range(walks):
                panel[s:s + 1, :] = table_ref[pl.ds(idxs[s], 1), :]
            rd = lambda a, b: panel[:, a:b]

        # ---- node branch: slab-test the tw children of each walk's node
        # (lane offsets scale with the packed width — ops/packing.py)
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
        # count fields) instead of one per child — the per-child lane
        # reductions were the substep's critical path (perf_r5d.py)
        packs = []
        boxes = []
        for group in range(0, tw, 4):
            acc = None
            for c in range(group, min(group + 4, tw)):
                box_c = child_box(c)
                boxes.append(box_c)
                m = box_c.astype(jnp.int32) << (8 * (c - group))
                acc = m if acc is None else acc + m
            packs.append(jnp.sum(acc, axis=1, keepdims=True))
        wants = []
        lane_want = None
        for c in range(tw):
            cnt = (packs[c // 4] >> (8 * (c % 4))) & 255
            any_c = (cnt > 0).astype(jnp.int32)
            valid_c = (links[c] > -1.0e8).astype(jnp.int32)
            wants.append(any_c * valid_c * is_node)
            if lane_counts:
                # per-LANE wanted-child tally: restores the reference
                # heatmap's per-pixel granularity (bvh_test.fs:224-232) —
                # each lane counts the nodes ITS ray would visit, not the
                # walk's shared fetch count
                w_c = boxes[c].astype(jnp.int32) * (valid_c * is_node)
                lane_want = w_c if lane_want is None else lane_want + w_c

        axis = rd(7 * tw, 7 * tw + 1)
        fwd = jnp.where(axis == 0.0, sx, jnp.where(axis == 1.0, sy, sz))

        p = ptr
        top = cur
        pushed = jnp.zeros_like(p)
        for j in range(tw):
            link_j = jnp.where(fwd > 0, links[tw - 1 - j],
                               links[j]).astype(jnp.int32)
            want_j = jnp.where(fwd > 0, wants[tw - 1 - j], wants[j])
            write = (stack_iota == p) & (jnp.broadcast_to(
                want_j, (walks, stack_depth)) > 0)
            stack[:, :] = jnp.where(write, jnp.broadcast_to(
                link_j, (walks, stack_depth)), stack[:, :])
            top = jnp.where(want_j > 0, link_j, top)
            pushed = jnp.maximum(pushed, want_j)
            p = p + want_j

        # ---- leaf branch: Moller-Trumbore the walk's leaf_size tris ----
        slot_base = leaf_ord * leaf_size
        leaf_mask = jnp.broadcast_to(is_leaf, (walks, LANES)) > 0
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

        # ---- advance (pop invariant: count=ptr entries, top at ptr-1) ---
        nptr = p - 1
        pop_at = jnp.clip(nptr, 0, stack_depth - 1)
        popped = jnp.sum(jnp.where(stack_iota == pop_at, stack[:, :], 0),
                         axis=1, keepdims=True)
        ncur = jnp.where(pushed > 0, top, popped)
        ncur = jnp.where(parked > 0, SENTINEL, ncur)
        nptr = jnp.where((parked > 0) | (ncur == SENTINEL), 0, nptr)
        if any_hit:
            done = jnp.sum(((bs >= 0) | (bt <= 0.0)).astype(jnp.float32),
                           axis=1, keepdims=True) >= float(LANES)
            ncur = jnp.where(done, SENTINEL, ncur)
            nptr = jnp.where(done, 0, nptr)
        if lane_counts:
            vis = vis + lane_want
        else:
            vis = vis + (1 - parked)
        return ncur, nptr, bt, bs, bu, bv, vis

    # Runaway backstop: a correct walk can visit each unique node at most
    # once per stack entry, so visits are bounded by the table size; cap
    # far above that so a lowering bug terminates (with wrong pixels and a
    # saturated visit count) instead of wedging the chip — a killed TPU
    # client holds the device claim for ~25 min (.claude/skills/verify).
    max_steps = 8 * (table_rows + 64)  # bound scales with table, not width

    pipelined = stage in ("pipe", "dma", "cond", "condh")

    def body(go):
        st = (walk_state[0:walks, 0:1].astype(jnp.int32),
              walk_state[walks:2 * walks, 0:1].astype(jnp.int32),
              t_ref[0], slot_ref[0], u_ref[0], v_ref[0],
              visits_ref[0] if lane_counts else visits_ref[0][:, 0:1])
        for j in range(unroll):
            st = substep_pipe(st, j) if pipelined else substep(st)
        cur, ptr, bt, bs, bu, bv, vis = st
        walk_state[0:walks, :] = lanes(cur)
        walk_state[walks:2 * walks, :] = lanes(ptr)
        visits_ref[0] = vis if lane_counts else lanes(vis)
        t_ref[0] = bt
        slot_ref[0] = bs
        u_ref[0] = bu
        v_ref[0] = bv
        # one fused cross-lane reduction per `unroll` visits.  In
        # lane-count mode the backstop watches the max lane tally (lane
        # counts are <= the walk's shared fetch count, so the bound holds).
        vis_top = (jnp.max(vis, axis=1, keepdims=True) if lane_counts
                   else vis)
        keep = lanes((cur != SENTINEL).astype(jnp.int32)
                     * (vis_top < max_steps).astype(jnp.int32))
        return jnp.sum(keep)

    ione = lambda v: jnp.full((walks, LANES), v, jnp.int32)
    walk_state[0:walks, :] = ione(0)           # cur = root
    walk_state[walks:2 * walks, :] = ione(1)   # ptr = 1
    # lane-count mode seeds 1: every ray visits the root (bvh_test.fs
    # counts the root pop for every pixel)
    visits_ref[0] = ione(1 if lane_counts else 0)
    t_ref[0] = t_init
    slot_ref[0] = jnp.full((walks, LANES), -1, jnp.int32)
    u_ref[0] = jnp.zeros((walks, LANES), jnp.float32)
    v_ref[0] = jnp.zeros((walks, LANES), jnp.float32)
    stack[:, 0:1] = jnp.full((walks, 1), SENTINEL, jnp.int32)
    if pipelined:
        # prologue: every walk starts at the root -> prefetch row 0
        if stage == "dma":
            for s in range(walks):
                _dma(0, s, jnp.int32(0)).start()
        else:
            for s in range(walks):
                panel[s:s + 1, :] = table_ref[pl.ds(0, 1), :]
    jax.lax.while_loop(lambda go: go > 0, body, jnp.int32(1))
    if stage == "dma":
        # retire the fetches the final substep issued (unroll is even, so
        # they always target buffer 0); waits only need matching shapes
        curf = walk_state[0:walks, 0:1].astype(jnp.int32)
        cur_sel = sel_of(curf)
        for s in range(walks):
            _dma(0, s, cur_sel[s, 0]).wait()


@functools.partial(jax.jit, static_argnames=("leaf_size", "any_hit",
                                             "stack_depth", "interpret",
                                             "unroll", "stage", "walks",
                                             "tree_width", "table_hbm",
                                             "lane_counts"))
def packet_traverse3(nodes, leaves, origin: V3, direction: V3, tmax=None, *,
                     leaf_size: int = 8, any_hit: bool = False,
                     stack_depth: int = 64,
                     interpret: bool = False,
                     unroll: int = 4, stage: str = "pipe",
                     walks: int = WALKS, tree_width: int = 8,
                     table_hbm: bool = False,
                     lane_counts: bool = False) -> PacketHit:
    """v3 multiwalk traversal: same contract as ops/traverse.packet_traverse
    (visits are per-128-ray walk rather than per-1024-ray packet).

    unroll: traversal visits advanced per while-loop body (state stays in
    registers; VMEM round-trips and the continue reduction amortize 1/U).
    Walks may overshoot by up to U-1 parked visits at the tail; parked
    substeps are no-ops, so results are unchanged (visits counts exclude
    them).
    stage: "value" materializes each fetched row panel once and
    lane-slices the register value; "ref" re-slices the VMEM scratch
    directly per field; "pipe"/"dma"/"cond"/"condh" are the round-4
    software-pipelined variants (fetch issued between node-advance and
    leaf tests; see substep_pipe).
    lane_counts: visits output reports PER-LANE wanted-node tallies (the
    count of nodes each lane's own ray wants, root included) instead of
    the walk's shared fetch count — restores the reference heatmap's
    per-pixel granularity (bvh_test.fs:224-232).  Forces the plain
    "value" stage.
    table_hbm: big-scene mode — the packed node+leaf table stays in HBM
    (no VMEM residency, no size budget) and every visit's rows arrive via
    the double-buffered async DMA of the "dma" stage, overlapped with the
    previous visit's leaf tests.  Forces stage "dma".  This removes the
    reference's only scene cap analog (GPU memory, main.js:408-437) at the
    cost of per-visit DMA latency; the VMEM path stays the fast default.
    """
    if table_hbm:
        stage = "dma"
    else:
        check_vmem_budget(nodes, leaves)
    if lane_counts:
        if table_hbm:
            raise ValueError("lane_counts is a VMEM-table diagnostic")
        stage = "value"
    if stage == "dma" and unroll % 2 != 0:
        raise ValueError("stage='dma' double-buffers the fetch panel per "
                         "substep; unroll must be even so every while-loop "
                         "body leaves the same buffer outstanding")
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

    kernel = functools.partial(_walk_kernel, leaf_size=leaf_size,
                               any_hit=any_hit, stack_depth=stack_depth,
                               table_rows=int(table.shape[0]),
                               unroll=unroll, stage=stage, walks=walks,
                               tree_width=tree_width,
                               lane_counts=lane_counts)
    out_block = pl.BlockSpec((1, walks, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((npg, walks, LANES), jnp.float32)
    out_shape_i = jax.ShapeDtypeStruct((npg, walks, LANES), jnp.int32)
    t, slot, u, v, visits = pl.pallas_call(
        kernel,
        grid=(npg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY)
            if (stage in ("hbm", "condh") or table_hbm) else
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, walks, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 5,
        out_shape=[out_shape, out_shape_i, out_shape, out_shape, out_shape_i],
        scratch_shapes=(
            [pltpu.VMEM((2, walks, LANES) if stage == "dma"
                        else (walks, LANES), jnp.float32),
             pltpu.VMEM((walks, stack_depth), jnp.int32),
             pltpu.VMEM((2 * walks, LANES), jnp.int32)]
            + ([pltpu.SemaphoreType.DMA((2, walks))] if stage == "dma"
               else [])
            + ([pltpu.VMEM(table.shape, jnp.float32),
                pltpu.SemaphoreType.DMA(())]
               if stage in ("hbm", "condh") else [])),
        interpret=interpret,
    )(n_nodes, table, rays)

    flat = lambda a: a.reshape(-1)[:n]
    return PacketHit(t=flat(t), slot=flat(slot), u=flat(u), v=flat(v),
                     visits=flat(visits))
