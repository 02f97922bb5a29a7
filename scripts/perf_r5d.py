#!/usr/bin/env python
"""Round-5: per-substep cost decomposition via a fixed-iteration kernel.

The phase-split kernel (v4) cut the redundant branch's vector work ~45%
per substep yet gained only ~5-7%, so the per-visit cost must sit in the
machinery both kernels share.  This micro replays the EXACT substep
structure (8 walks, one row fetch each, 8-child slab votes, 8-tri MT,
one-hot stack ops) for a fixed K steps — no termination condition, so
component variants stay directly comparable:

  full      — fetch + slab + MT + stack        (v3 substep)
  node      — fetch + slab + stack, no MT      (v4 node substep)
  leaf      — fetch + MT only                  (v4 drain substep)
  fetch     — 8 dynamic row fetches + consume, no tests
  vector    — slab + MT + stack on a static panel, no fetch
  fetch1    — ONE dynamic row fetch + consume (per-fetch marginal cost)

ns/substep = t / K.  v3's measured production figure is ~1.1-1.45 us.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5d.py
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

from fspt_tpu.testing import make_bunny_standin_scene

WALKS, LANES = 8, 128
K = 4096          # substeps per program
DEPTH = 64


def micro_kernel(table_ref, rays_ref, out_ref, panel, stack, *,
                 variant: str, table_rows: int):
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    tw = 8
    stack_iota = jax.lax.broadcasted_iota(jnp.int32, (WALKS, DEPTH), 1)

    def body(i, st):
        cur, ptr, bt, acc = st
        do_fetch = variant in ("full", "node", "leaf", "fetch", "fetch1")
        if do_fetch:
            # dynamic, data-dependent row indices like the real walk
            base = (cur * jnp.int32(-1640531527) + i) % table_rows
            base = jnp.abs(base)
            idxs = [base[s, 0] for s in
                    range(1 if variant == "fetch1" else WALKS)]
            for s, ix_ in enumerate(idxs):
                panel[s:s + 1, :] = table_ref[pl.ds(ix_, 1), :]
        cache = {}

        def rd(a, b):
            if (a, b) not in cache:
                cache[(a, b)] = panel[0:WALKS, a:b]
            return cache[(a, b)]

        if variant in ("fetch", "fetch1"):
            acc = acc + rd(0, 1)
            ncur = (cur + 1) % table_rows
            return ncur, ptr, bt, acc

        # ---- slab votes + stack (node path) ----
        if variant in ("full", "node", "vector"):
            wants = []
            for c in range(tw):
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
                hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < bt)
                wants.append((jnp.sum(hit.astype(jnp.float32), axis=1,
                                      keepdims=True) > 0).astype(jnp.int32))
            p = ptr
            top = cur
            pushed = jnp.zeros_like(p)
            for c in range(tw):
                link_c = rd(6 * tw + c, 6 * tw + c + 1).astype(jnp.int32)
                write = (stack_iota == p) & (jnp.broadcast_to(
                    wants[c], (WALKS, DEPTH)) > 0)
                stack[:, :] = jnp.where(write, jnp.broadcast_to(
                    link_c, (WALKS, DEPTH)), stack[:, :])
                top = jnp.where(wants[c] > 0, link_c, top)
                pushed = jnp.maximum(pushed, wants[c])
                p = p + wants[c]
            nptr = jnp.clip(p - 1, 0, DEPTH - 1)
            popped = jnp.sum(jnp.where(stack_iota == nptr, stack[:, :], 0),
                             axis=1, keepdims=True)
            cur = jnp.abs(jnp.where(pushed > 0, top, popped)) % table_rows
            ptr = nptr

        # ---- MT (leaf path) ----
        if variant in ("leaf2", "leaf4"):
            # K independent fetch+MT units per substep: if the substep is
            # loop-carried-latency-bound, per-unit cost should collapse
            # toward the marginal vector work
            kk = 2 if variant == "leaf2" else 4
            base = jnp.abs((cur * jnp.int32(-1640531527) + i) % table_rows)
            # each unit uses its OWN panel rows so the K fetch+MT chains
            # are genuinely independent (no WAR hazard on the buffer)
            for u in range(kk):
                off = u * WALKS
                for s in range(WALKS):
                    panel[off + s:off + s + 1, :] = table_ref[
                        pl.ds((base[s, 0] + u) % table_rows, 1), :]
            for u in range(kk):
                off = u * WALKS

                def rdu(a, b, off=off):
                    return panel[off:off + WALKS, a:b]
                for j in range(8):
                    b = 9 * j
                    c = [rdu(b + q, b + q + 1) for q in range(9)]
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
                    ok = ((jnp.abs(det) >= 1e-6) & (uu >= 0.0) & (uu <= 1.0)
                          & (ww >= 0.0) & (uu + ww <= 1.0) & (tt > 1e-6)
                          & (tt < bt))
                    bt = jnp.where(ok, tt, bt)
            cur = (cur + 1) % table_rows
            return cur, ptr, bt, acc

        if variant in ("full", "leaf", "vector"):
            for j in range(8):
                b = 9 * j
                c = [rd(b + q, b + q + 1) for q in range(9)]
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
                ok = ((jnp.abs(det) >= 1e-6) & (uu >= 0.0) & (uu <= 1.0)
                      & (ww >= 0.0) & (uu + ww <= 1.0) & (tt > 1e-6)
                      & (tt < bt))
                bt = jnp.where(ok, tt, bt)
            if variant == "leaf":
                cur = (cur + 1) % table_rows
        return cur, ptr, bt, acc

    cur0 = jnp.ones((WALKS, 1), jnp.int32)
    ptr0 = jnp.ones((WALKS, 1), jnp.int32)
    bt0 = jnp.full((WALKS, LANES), 1e9, jnp.float32)
    acc0 = jnp.zeros((WALKS, 1), jnp.float32)
    stack[:, 0:1] = jnp.zeros((WALKS, 1), jnp.int32)
    panel[0:WALKS, :] = table_ref[0:WALKS, :]
    cur, ptr, bt, acc = jax.lax.fori_loop(
        0, K, body, (cur0, ptr0, bt0, acc0))
    out_ref[0] = bt + acc + cur.astype(jnp.float32) + ptr.astype(jnp.float32)


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    a = scene.arrays
    table = jnp.asarray(np.concatenate([a.pk_nodes, a.pk_leaves], axis=0))
    rows = int(table.shape[0])
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(1, 6, WALKS, LANES))
                       .astype(np.float32) + 0.5)

    for variant in ("full", "leaf", "leaf2", "leaf4"):
        kern = functools.partial(micro_kernel, variant=variant,
                                 table_rows=rows)
        call = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(table.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, WALKS, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, WALKS, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, WALKS, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((4 * WALKS, LANES), jnp.float32),
                            pltpu.VMEM((WALKS, DEPTH), jnp.int32)],
        )
        fn = jax.jit(lambda t, r: call(t, r))
        np.asarray(fn(table, rays))           # compile+warm
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = fn(table, rays)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{variant:8s} {dt / K * 1e9:8.1f} ns/substep "
              f"({dt * 1e3:.2f} ms for {K})", flush=True)


if __name__ == "__main__":
    main()
