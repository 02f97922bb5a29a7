#!/usr/bin/env python
"""Round-5: traversal-only micro — v3 fused vs v4 phase-split knobs on
the REAL captured bounce-0 launch (nearest-hit, the dominant cost).

Usage: PYTHONPATH=/root/repo:/root/.axon_site:scripts python scripts/perf_r5c.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from r5common import capture_bounce0, drain, timed

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.traverse3 import packet_traverse3
from fspt_tpu.ops.traverse4 import packet_traverse4
from fspt_tpu.testing import make_bunny_standin_scene


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, compact=True,
                       compact_schedule=(1.45, 9.5, 40, 128, 512,
                                         2048, 2048, 2048))
    print("capturing bounce-0 launch ...", flush=True)
    so, sd, stm, sa = capture_bounce0(scene, arrays, meta, cfg)
    nl = int(so.x.shape[0])
    print(f"launch lanes={nl} active={int(np.asarray(sa).sum())}")
    nodes = jnp.asarray(arrays.pk_nodes)
    leaves = jnp.asarray(arrays.pk_leaves)
    sdep = meta.pk_stack_depth

    def t3(**kw):
        return timed(jax.jit(functools.partial(
            packet_traverse3, leaf_size=8, stack_depth=sdep, **kw),
            static_argnames=()), nodes, leaves, so, sd, stm, reps=5)

    def t4(**kw):
        fn = jax.jit(lambda n, l, o, d, tm: packet_traverse4(
            n, l, o, d, tm, leaf_size=8, stack_depth=sdep, **kw))
        return timed(fn, nodes, leaves, so, sd, stm, reps=5)

    base = timed(jax.jit(lambda n, l, o, d, tm: packet_traverse3(
        n, l, o, d, tm, leaf_size=8, stack_depth=sdep)),
        nodes, leaves, so, sd, stm, reps=5)
    print(f"v3 (ship)                    {base * 1e3:8.2f} ms", flush=True)
    for kw in (dict(npop=2, lpop=2),
               dict(npop=1, lpop=1, walks=16, qcap=64),
               dict(npop=1, lpop=2, walks=16, qcap=64),
               dict(npop=2, lpop=2, walks=16),
               dict(npop=1, lpop=2, walks=32, qcap=64),
               ):
        t = t4(**kw)
        print(f"v4 {str(kw):57s} {t * 1e3:8.2f} ms", flush=True)

    # visit accounting: v4 visits == v3 visits (same unions)?
    h3 = drain(jax.jit(lambda: packet_traverse3(
        nodes, leaves, so, sd, stm, leaf_size=8, stack_depth=sdep))())
    h4 = drain(jax.jit(lambda: packet_traverse4(
        nodes, leaves, so, sd, stm, leaf_size=8, stack_depth=sdep))())
    v3v = np.asarray(h3.visits).reshape(-1, 128)[:, 0]
    v4v = np.asarray(h4.visits).reshape(-1, 128)[:, 0]
    print(f"visits/walk: v3 {v3v.mean():.1f}  v4 {v4v.mean():.1f} "
          f"(equal slots: {(np.asarray(h3.slot) == np.asarray(h4.slot)).mean():.4f})")


if __name__ == "__main__":
    main()
