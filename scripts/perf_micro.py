#!/usr/bin/env python
"""Micro-benchmarks behind the round-4 redesigns (PERF.md cites these).

Measures, at bench-realistic shapes on the real chip:
  * lax.sort variants (2-key vs payload-carry vs argsort) — the
    coherence-sort permutation itself is cheap (~3 ms at 403k);
  * row gather vs row SCATTER — the inverse-permutation scatter is the
    expensive half (6–36 ms), which motivated cfg.sort_state (permute the
    state once, never un-permute hits);
  * scatter-add radiance deposits and cumsum — deposits at 262k lanes
    cost 6.6 ms each (hence deferred single-deposit compaction) and two
    cumsums already exceed the selection sort (hence no prefix-sum
    survivor selection).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def drain(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:8])
    return x


def timed(name, fn, *a, reps=10):
    drain(fn(*a))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    drain(out)
    print(f"{name:34s} {(time.time() - t0) / reps * 1e3:7.2f} ms",
          flush=True)


def main():
    n = 403456           # the bench's bounce-0 launch width
    key = jax.random.key(0)
    k = jax.random.randint(key, (n,), 0, 1 << 24, dtype=jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)
    rows = jax.random.normal(jax.random.key(1), (n, 7), jnp.float32)
    timed("sort num_keys=2 403k", jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)),
        k, lane)
    timed("sort num_keys=1 403k", jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False)),
        k, lane)
    timed("argsort 403k", jax.jit(jnp.argsort), k)
    p = jax.lax.sort((k, lane), num_keys=2)[1]
    timed("row gather (403k,7)", jax.jit(lambda r, q: r[q]), rows, p)
    x5 = jax.random.normal(jax.random.key(2), (n, 5), jnp.float32)
    timed("row scatter-set (403k,5)", jax.jit(
        lambda q, v: jnp.zeros_like(v).at[q].set(v)), p, x5)

    m = 262144           # one sample's framebuffer
    lidx = jax.random.permutation(key, jnp.arange(m, dtype=jnp.int32))
    vals = jax.random.normal(key, (m, 3), jnp.float32)
    acc = jnp.zeros((m, 3), jnp.float32)
    timed("deposit scatter-add (262k,3)", jax.jit(
        lambda a, i, v: a.at[i].add(v, unique_indices=True,
                                    mode="promise_in_bounds")),
        acc, lidx, vals)
    timed("deposit scatter-set (262k,3)", jax.jit(
        lambda a, i, v: a.at[i].set(v, unique_indices=True,
                                    mode="promise_in_bounds")),
        acc, lidx, vals)
    timed("cumsum 262k i32", jax.jit(jnp.cumsum), (lidx > 0).astype(
        jnp.int32))


if __name__ == "__main__":
    main()
