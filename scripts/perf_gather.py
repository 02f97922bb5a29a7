#!/usr/bin/env python
"""Trustworthy gather/shade timings: every measurement reduces its output to
a scalar inside the jitted fn and device_gets it, so axon's loose
block_until_ready can't fake fast numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.integrator import atlas_fetch_rgb
from fspt_tpu.core.env import env_radiance
from fspt_tpu.core.vec import V3
from fspt_tpu.testing import make_bunny_standin_scene


def timed(name, fn, *args, reps=10):
    # reduce to scalar inside jit; fetch the scalar = true drain
    fn2 = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y, jax.tree.map(lambda v: jnp.sum(v.astype(jnp.float32)), fn(*a))))
    t0 = time.time()
    float(fn2(*args))
    c = time.time() - t0
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc += float(fn2(*args))
    r = (time.time() - t0) / reps
    print(f"{name:46s} compile={c:6.1f}s  run={r * 1e3:8.2f}ms")
    return r


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    n = 512 * 512
    rng = np.random.default_rng(0)
    m = meta.atlas_res * meta.atlas_res * 4
    table = jnp.asarray(rng.random(m), jnp.float32)
    idx = jnp.asarray(rng.integers(0, m, n), jnp.int32)
    timed("scalar gather (N,) from (262k,)", lambda t, i: t[i], table, idx)
    timed("12x scalar gather (N,) from (262k,)",
          lambda t, i: sum(t[(i + 7 * k) % m] for k in range(12)), table, idx)
    table8 = jnp.asarray(rng.random((m // 8, 8)), jnp.float32)
    idx8 = jnp.asarray(rng.integers(0, m // 8, n), jnp.int32)
    timed("row gather (N,8) from (33k,8)", lambda t, i: t[i], table8, idx8)
    table64 = jnp.asarray(rng.random((m // 64, 64)), jnp.float32)
    idx64 = jnp.asarray(rng.integers(0, m // 64, n), jnp.int32)
    timed("row gather (N,64) from (4k,64)", lambda t, i: t[i], table64, idx64)
    tsort = jnp.sort(idx)
    timed("scalar gather sorted idx", lambda t, i: t[i], table, tsort)
    # take_along_axis form
    timed("take (N,) from (262k,)", lambda t, i: jnp.take(t, i), table, idx)

    slot = jnp.asarray(rng.integers(0, arrays.ior.shape[0], n), jnp.int32)
    uvu = jnp.asarray(rng.random(n), jnp.float32)
    uvv = jnp.asarray(rng.random(n), jnp.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0)
    dirs = V3(jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]))

    timed("atlas_fetch_rgb x1", lambda l, a, b:
          atlas_fetch_rgb(arrays, meta, l, a, b),
          arrays.map_d[slot], uvu, uvv)
    timed("env_radiance x1", lambda dd:
          env_radiance(arrays.env_rgb, (meta.env_h, meta.env_w), dd,
                       arrays.env_theta), dirs)

    def attr_gathers(sl):
        outs = []
        for nm in ("nrm0", "nrm1", "nrm2", "tan0", "tan1", "tan2",
                   "btn0", "btn1", "btn2", "emit"):
            v = getattr(arrays, nm)
            outs += [v.x[sl], v.y[sl], v.z[sl]]
        for nm in ("uv0u", "uv0v", "uv1u", "uv1v", "uv2u", "uv2v",
                   "ior", "dielectric"):
            outs.append(getattr(arrays, nm)[sl])
        for nm in ("map_d", "map_e", "map_n", "map_mr"):
            outs.append(getattr(arrays, nm)[sl].astype(jnp.float32))
        return outs
    timed("attribute gathers (42 planes)", attr_gathers, slot)

    # packed-row alternative: all 42 attrs in one (S, 48) table
    s_slots = arrays.ior.shape[0]
    packed = jnp.asarray(rng.random((s_slots, 48)), jnp.float32)
    timed("packed row gather (N,48) from (S,48)",
          lambda t, i: t[i], packed, slot)
    # packed via take
    timed("packed take axis0 (N,48)",
          lambda t, i: jnp.take(t, i, axis=0), packed, slot)


if __name__ == "__main__":
    main()
