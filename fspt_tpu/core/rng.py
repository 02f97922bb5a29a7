"""Counter-based random numbers for the integrator.

The reference uses a fract(sin(seed)) hash re-seeded per pixel/hit
(tracer.fs:181,438,458) — neither deterministic across GPUs nor
checkpointable.  Here randomness is jax.random (threefry) keyed by
(base_seed, sample_index, stream): fully deterministic, reproducible across
restarts (checkpoint stores just the base seed + sample count), and cheap to
generate in wide batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_key(base_key, sample_index):
    return jax.random.fold_in(base_key, sample_index)


def stream_uniforms(key, stream: int, shape):
    """Uniforms in [0, 1) for a numbered stream within one sample step."""
    return jax.random.uniform(jax.random.fold_in(key, stream), shape,
                              dtype=jnp.float32)
