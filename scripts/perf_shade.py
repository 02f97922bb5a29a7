#!/usr/bin/env python
"""Shading-cost microbenchmark: profile_r2.py showed ~2.0s of the 3.4s
sample step is NOT traversal or sort.  Decompose one _shade_and_scatter
iteration into gathers / atlas fetch / env radiance / brdf math, and measure
TPU gather throughput for the shapes we use (scalar plane gathers vs row
gathers) to decide the attribute-table layout.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_shade.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.integrator import atlas_fetch_rgb, _shade_and_scatter, PathState
from fspt_tpu.core.env import env_radiance, sample_env_bins
from fspt_tpu.core import brdf
from fspt_tpu.core.vec import V3
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.testing import make_bunny_standin_scene


def timed(name, fn, *args, reps=10):
    fn2 = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(fn2(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn2(*args)
    jax.block_until_ready(out)
    r = (time.time() - t0) / reps
    print(f"{name:44s} compile={c:6.1f}s  run={r * 1e3:8.2f}ms")
    return r


def main():
    scene = make_bunny_standin_scene(subdivisions=6)
    arrays = scene.device_arrays()
    meta = scene.meta
    cfg = RenderConfig(width=512, height=512, bounces=8,
                       extra_refraction_iters=0, batch_spp=1)
    n = 512 * 512
    key = sample_key(jax.random.key(0), 0)
    u = stream_uniforms(key, 1, (11, n))
    rng = np.random.default_rng(0)
    slot = jnp.asarray(rng.integers(0, arrays.ior.shape[0], n), jnp.int32)
    uvu = jnp.asarray(rng.random(n), jnp.float32)
    uvv = jnp.asarray(rng.random(n), jnp.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0)
    dirs = V3(jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]))

    # --- raw gather shapes -------------------------------------------------
    m = meta.atlas_res * meta.atlas_res * 4
    table = jnp.asarray(rng.random(m), jnp.float32)
    idx = jnp.asarray(rng.integers(0, m, n), jnp.int32)
    timed("scalar gather (N,) from (327k,)", lambda t, i: t[i], table, idx)
    table8 = jnp.asarray(rng.random((m // 8, 8)), jnp.float32)
    idx8 = jnp.asarray(rng.integers(0, m // 8, n), jnp.int32)
    timed("row gather (N,8) from (41k,8)", lambda t, i: t[i], table8, idx8)
    table64 = jnp.asarray(rng.random((m // 64, 64)), jnp.float32)
    idx64 = jnp.asarray(rng.integers(0, m // 64, n), jnp.int32)
    timed("row gather (N,64) from (5k,64)", lambda t, i: t[i], table64, idx64)
    small = jnp.asarray(rng.random(1024), jnp.float32)
    idxs = jnp.asarray(rng.integers(0, 1024, n), jnp.int32)
    timed("scalar gather (N,) from (1k,)", lambda t, i: t[i], small, idxs)
    srt = jnp.sort(idx)
    timed("scalar gather sorted idx (327k,)", lambda t, i: t[i], table, srt)

    # one-hot matmul gather from small table
    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, 1024, dtype=jnp.bfloat16)
        return oh @ t.astype(jnp.bfloat16)
    timed("one-hot matmul gather (N,) from (1k,)", onehot_gather, small, idxs)

    # --- shading pieces ----------------------------------------------------
    timed("atlas_fetch_rgb x1", lambda l, a, b:
          atlas_fetch_rgb(arrays, meta, l, a, b),
          arrays.map_d[slot], uvu, uvv)
    timed("env_radiance x1", lambda dd:
          env_radiance(arrays.env_rgb, (meta.env_h, meta.env_w), dd,
                       arrays.env_theta), dirs)
    timed("sample_env_bins", lambda a, b, c: sample_env_bins(
        (arrays.bin_x0, arrays.bin_y0, arrays.bin_x1, arrays.bin_y1),
        arrays.n_bins, (meta.env_h, meta.env_w), arrays.env_theta,
        a, b, c), u[2], u[3], u[4])

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
            outs.append(getattr(arrays, nm)[sl])
        return outs
    timed("attribute gathers (42 planes)", attr_gathers, slot)

    def brdf_math(dd, uu):
        micro = brdf.sample_microfacet(dd, uu[0], uu[0], uu[1])
        f = brdf.schlick(dd, micro, uu[2] + 1.0, uu[3] + 1.2)
        spec = brdf.reflect(dd, micro)
        pdf = brdf.gtr2_pdf(dd, micro, uu[4], spec)
        lam = brdf.sample_lambert(dd, uu[5], uu[6])
        return micro, f, spec, pdf, lam
    timed("brdf math bundle", brdf_math, dirs, u)

    # --- one full shade iteration (traversal mocked out) -------------------
    state = PathState(
        origin=V3(uvu, uvv, uvu), direction=dirs,
        t=jnp.full((n,), 2.0), slot=slot, bu=uvu * 0.3, bv=uvv * 0.3,
        throughput=V3(uvu, uvu, uvu), color=V3(uvv, uvv, uvv),
        bounces_used=jnp.zeros(n, jnp.int32),
        active=jnp.ones(n, bool), prev_pdf=jnp.full(n, 1e16),
        lidx=jnp.arange(n, dtype=jnp.int32),
        gid=jnp.arange(n, dtype=jnp.int32))
    cfg_brute_off = RenderConfig(width=512, height=512, bounces=8,
                                 extra_refraction_iters=0, sort_rays=False)

    import fspt_tpu.core.integrator as I
    orig = I.sorted_intersect
    from fspt_tpu.ops.traverse import PacketHit
    def fake_intersect(scene, cfg, meta, o, dd, active, tmax=None,
                       any_hit=False):
        nn = o.x.shape[0]
        return PacketHit(t=jnp.full((nn,), 1.0), slot=jnp.full((nn,), -1,
                         jnp.int32), u=jnp.zeros(nn), v=jnp.zeros(nn),
                         visits=jnp.zeros(nn, jnp.int32))
    I.sorted_intersect = fake_intersect
    attr_t = I._attr_table(arrays)
    tex_t = I._packed_tables(arrays, cfg_brute_off, meta)
    try:
        timed("full shade iter (no traversal)", lambda s:
              _shade_and_scatter(arrays, cfg_brute_off, meta, s, u,
                                 (meta.env_h, meta.env_w), attr_t, tex_t),
              state)
    finally:
        I.sorted_intersect = orig


if __name__ == "__main__":
    main()
