"""Geometry primitive tests: Moller-Trumbore, slab AABB, barycentrics."""

import jax.numpy as jnp
import numpy as np

from fspt_tpu.core.geometry import (MAX_T, barycentric_weights,
                                    brute_force_intersect, intersect_aabb,
                                    intersect_tri)


def test_tri_hit_distance():
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    t = intersect_tri(o, d, v0, e1, e2)
    np.testing.assert_allclose(t, [1.0], rtol=1e-6)


def test_tri_miss_outside_barycentric():
    o = jnp.array([[2.0, 2.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    assert float(intersect_tri(o, d, v0, e1, e2)[0]) == MAX_T


def test_tri_parallel_and_behind():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    # parallel ray
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    assert float(intersect_tri(o, d, v0, e1, e2)[0]) == MAX_T
    # triangle behind origin
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    assert float(intersect_tri(o, d, v0, e1, e2)[0]) == MAX_T


def test_degenerate_triangle_is_finite_miss():
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    z = jnp.zeros((1, 3))
    t = intersect_tri(o, d, z, z, z)
    assert np.isfinite(float(t[0])) and float(t[0]) == MAX_T


def test_aabb_entry_distance_and_inside():
    o = jnp.array([[0.0, 0.0, 2.0]])
    inv = 1.0 / jnp.array([[1e-20, 1e-20, -1.0]])
    bmin = jnp.array([[-1.0, -1.0, -1.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    t = intersect_aabb(o, 1.0 / jnp.array([[1e20, 1e20, -1.0]]) * 0 + inv,
                       bmin, bmax)
    np.testing.assert_allclose(t, [1.0], rtol=1e-5)
    # origin inside box -> negative tmin but still a hit (tmax > 0)
    o2 = jnp.array([[0.0, 0.0, 0.0]])
    t2 = intersect_aabb(o2, inv, bmin, bmax)
    assert float(t2[0]) < 0.0


def test_aabb_miss():
    o = jnp.array([[5.0, 5.0, 2.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    inv = 1.0 / d
    bmin = jnp.array([[-1.0, -1.0, -1.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    assert float(intersect_aabb(o, inv, bmin, bmax)[0]) == MAX_T


def test_barycentric_weights_reconstruct_point():
    rng = np.random.default_rng(3)
    v0 = rng.normal(size=(8, 3)).astype(np.float32)
    e1 = rng.normal(size=(8, 3)).astype(np.float32)
    e2 = rng.normal(size=(8, 3)).astype(np.float32)
    u = rng.uniform(0, 1, size=(8, 1)).astype(np.float32) * 0.5
    v = rng.uniform(0, 1, size=(8, 1)).astype(np.float32) * 0.5
    p = v0 + u * e1 + v * e2
    w = barycentric_weights(jnp.asarray(p), jnp.asarray(v0), jnp.asarray(e1),
                            jnp.asarray(e2))
    # w = (u_weight_for_v0, v (e1), w (e2))
    np.testing.assert_allclose(w[:, 1:2], u, atol=1e-4)
    np.testing.assert_allclose(w[:, 2:3], v, atol=1e-4)
    np.testing.assert_allclose(w.sum(axis=1), np.ones(8), atol=1e-5)


def test_brute_force_nearest():
    # two parallel triangles; nearest should win
    v0 = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.5]])
    e1 = jnp.array([[1.0, 0.0, 0.0]] * 2)
    e2 = jnp.array([[0.0, 1.0, 0.0]] * 2)
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, idx = brute_force_intersect(o, d, v0, e1, e2)
    np.testing.assert_allclose(t, [0.5], rtol=1e-6)
    assert int(idx[0]) == 1
