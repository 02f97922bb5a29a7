"""Ray-geometry intersection primitives, vectorized over ray batches.

Parity targets: reference tracer.fs rayTriangleIntersect (:300-315,
Moller-Trumbore with epsilon-degenerate rejection), rayBoxIntersect (:317-326,
slab test returning tMin or MAX_T), barycentricWeights (:339-353).

All functions are shape-polymorphic pure jnp ops: rays broadcast against
candidate triangle sets, misses are encoded as `max_t`, and every division is
guarded so padding/degenerate triangles produce finite values (required for
clean reverse-mode differentiation — NaN * 0 poisons gradients).
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_T = 1.0e5          # reference tracer.fs:10
EPSILON = 1.0e-6       # reference tracer.fs:11


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def normalize(v, eps: float = 1.0e-20):
    return v * jnp.reciprocal(jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps))


def intersect_tri(origin, direction, v0, e1, e2,
                  eps: float = EPSILON, max_t: float = MAX_T):
    """Moller-Trumbore. origin/direction: (..., 3); v0/e1/e2: (..., 3)
    broadcastable against them. Returns t (...,) with `max_t` for misses.

    Matches reference tracer.fs:300-315: |det| < eps, u/v barycentric bounds,
    and t > eps all reject.
    """
    p = cross(direction, e2)
    det = dot(e1, p)
    valid = jnp.abs(det) >= eps
    inv_det = jnp.reciprocal(jnp.where(valid, det, 1.0))
    tvec = origin - v0
    u = dot(tvec, p) * inv_det
    q = cross(tvec, e1)
    v = dot(direction, q) * inv_det
    t = dot(e2, q) * inv_det
    hit = valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > eps)
    return jnp.where(hit, t, max_t)


def intersect_aabb(origin, inv_dir, bmin, bmax, max_t: float = MAX_T):
    """Slab test. Returns entry distance tMin, or `max_t` when missed
    (reference tracer.fs:317-326: hit iff tMax >= tMin and tMax > 0)."""
    t1 = (bmin - origin) * inv_dir
    t2 = (bmax - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.0)
    return jnp.where(hit, tmin, max_t)


def barycentric_weights(p, v0, e1, e2):
    """(u, v, w) weights of point p in triangle (v0, v0+e1, v0+e2)
    (reference tracer.fs:339-353). Returns (..., 3) [u, v, w] where u weights
    v0, v weights v1, w weights v2."""
    v2 = p - v0
    d00 = dot(e1, e1)
    d01 = dot(e1, e2)
    d11 = dot(e2, e2)
    d20 = dot(v2, e1)
    d21 = dot(v2, e2)
    denom = d00 * d11 - d01 * d01
    inv = jnp.reciprocal(jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0))
    v = (d11 * d20 - d01 * d21) * inv
    w = (d00 * d21 - d01 * d20) * inv
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def brute_force_intersect(origin, direction, tri_v0, tri_e1, tri_e2,
                          max_t: float = MAX_T, chunk: int = 512):
    """O(N_rays * N_tris) oracle intersector: nearest (t, slot).

    Chunked over triangles so memory stays O(N_rays * chunk).  This is the
    correctness oracle for BVH traversal (the reference has no equivalent —
    its only cross-check is the CPU autofocus raycast, main.js:447-546).
    """
    import jax

    n_tris = tri_v0.shape[0]
    n_pad = (-n_tris) % chunk
    v0 = jnp.concatenate([tri_v0, jnp.zeros((n_pad, 3), tri_v0.dtype)])
    e1 = jnp.concatenate([tri_e1, jnp.zeros((n_pad, 3), tri_e1.dtype)])
    e2 = jnp.concatenate([tri_e2, jnp.zeros((n_pad, 3), tri_e2.dtype)])
    n_chunks = (n_tris + n_pad) // chunk

    def body(carry, ci):
        best_t, best_i = carry
        sl = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, sl, chunk)
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk)
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk)
        t = intersect_tri(origin[..., None, :], direction[..., None, :],
                          cv0, ce1, ce2, max_t=max_t)        # (..., chunk)
        ti = jnp.argmin(t, axis=-1)
        tv = jnp.min(t, axis=-1)
        better = tv < best_t
        best_i = jnp.where(better, sl + ti, best_i)
        best_t = jnp.where(better, tv, best_t)
        return (best_t, best_i), None

    init = (jnp.full(origin.shape[:-1], max_t, dtype=jnp.float32),
            jnp.full(origin.shape[:-1], -1, dtype=jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    best_i = jnp.where(best_i >= n_tris, -1, best_i)
    best_i = jnp.where(best_t >= max_t, -1, best_i)
    return best_t, best_i
