#!/usr/bin/env python
"""v5 mixed-substep kernel A/B vs the shipped v4 phase-split kernel, on
the REAL captured bounce-0 launch (see ops/traverse5.py docstring for
the design; scripts/perf_r5d.py for the unit-amortization curve it
banks on).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_r5i.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.config import RenderConfig
from fspt_tpu.testing import make_bunny_standin_scene

from r5common import capture_bounce0, drain, timed  # noqa: E402


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, compact=True,
                       intersector="split",
                       compact_schedule=(1.5, 11, 48, 160, 640,
                                         2048, 2048, 2048))
    print("capturing bounce-0 launch ...", flush=True)
    so, sd, stm, sa = capture_bounce0(scene, arrays, meta, cfg)
    nl = int(so.x.shape[0])
    print(f"launch lanes={nl} active={int(np.asarray(sa).sum())}")

    nodes = jnp.asarray(arrays.pk_nodes)
    leaves = jnp.asarray(arrays.pk_leaves)
    sdep = meta.pk_stack_depth + 16

    from fspt_tpu.ops.traverse4 import packet_traverse4
    from traverse5_proto import packet_traverse5

    v4 = jax.jit(functools.partial(
        packet_traverse4, leaf_size=meta.leaf_size, stack_depth=sdep))
    t4 = timed(lambda o, d, tm: v4(nodes, leaves, o, d, tm),
               so, sd, stm, reps=5)
    ref = drain(v4(nodes, leaves, so, sd, stm))
    vis4 = np.asarray(ref.visits).reshape(-1, 128)[:, 0]
    print(f"v4 (ship: u6/d4 npop2/lpop2)   {t4 * 1e3:8.2f} ms  "
          f"visits/walk={vis4.mean():.1f}")

    ref_t = np.asarray(ref.t)
    ref_s = np.asarray(ref.slot)

    best = None
    for kw in (dict(npop=2, lpop=2, unroll=4, drain_unroll=4),
               dict(npop=2, lpop=2, unroll=6, drain_unroll=4),
               dict(npop=2, lpop=2, unroll=2, drain_unroll=4),
               dict(npop=2, lpop=1, unroll=4, drain_unroll=4),
               dict(npop=1, lpop=2, unroll=6, drain_unroll=4),
               dict(npop=2, lpop=3, unroll=4, drain_unroll=4),
               dict(npop=3, lpop=2, unroll=4, drain_unroll=4),
               ):
        v5 = jax.jit(functools.partial(
            packet_traverse5, leaf_size=meta.leaf_size, stack_depth=sdep,
            **kw))
        try:
            out = drain(v5(nodes, leaves, so, sd, stm))
        except Exception as e:  # noqa: BLE001
            print(f"v5 {kw}: FAILED {type(e).__name__}: {e}")
            continue
        t5 = timed(lambda o, d, tm: v5(nodes, leaves, o, d, tm),
                   so, sd, stm, reps=5)
        vis5 = np.asarray(out.visits).reshape(-1, 128)[:, 0]
        s_match = float((np.asarray(out.slot) == ref_s).mean())
        t_close = float(np.isclose(np.asarray(out.t), ref_t,
                                   rtol=1e-5, atol=1e-5).mean())
        tag = " ".join(f"{k[0]}{v}" for k, v in kw.items())
        print(f"v5 {tag:<24s} {t5 * 1e3:8.2f} ms  "
              f"visits/walk={vis5.mean():.1f}  slot_match={s_match:.6f} "
              f"t_close={t_close:.6f}")
        if best is None or t5 < best[0]:
            best = (t5, kw)
    if best:
        print(f"\nbest v5 {best[1]} = {best[0]*1e3:.2f} ms vs v4 "
              f"{t4*1e3:.2f} ms -> "
              f"{'GO' if best[0] < t4 * 0.97 else 'NO-GO'}")


if __name__ == "__main__":
    main()
