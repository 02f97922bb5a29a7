"""Counter-based random numbers for the integrator.

The reference uses a fract(sin(seed)) hash re-seeded per pixel/hit
(tracer.fs:181,438,458) — neither deterministic across GPUs nor
checkpointable.  Here randomness is jax.random (threefry) keyed by
(base_seed, sample_index, stream, global lane): fully deterministic,
reproducible across restarts (checkpoint stores just the base seed + sample
count), and — because the lane index is explicit rather than positional —
**sharding-invariant**: a device generating only lanes [off, off+local) of a
stream reproduces exactly the values a single device generates for those
lanes.  That makes the sharded sample step (parallel/dist.py) bit-identical
to the single-device renderer, which the parallel tests assert per-pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_key(base_key, sample_index):
    return jax.random.fold_in(base_key, sample_index)


def stream_uniforms(key, stream: int, shape, lane_offset=0):
    """Uniforms in [0, 1) for a numbered stream within one sample step.

    shape: (rows, n).  The value at (r, i) is a pure function of
    (key, stream, r, global lane id) — NOT of n — so shards of a larger
    lane space draw their exact slice of the single-device streams.
    lane_offset: scalar offset (lane ids = offset + arange(n)) or an (n,)
    array of explicit global lane ids (for interleaved shard assignment,
    parallel/dist.py).
    """
    rows, n = shape
    k = jax.random.fold_in(key, stream)
    lane_offset = jnp.asarray(lane_offset)
    if lane_offset.ndim == 0:
        ids = lane_offset.astype(jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    else:
        ids = lane_offset.astype(jnp.uint32)
    lane_keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(ids)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (rows,)))(lane_keys)
    return u.T
