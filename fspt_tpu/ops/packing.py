"""Pack the host-built BVH into the lane-dense VMEM tables the Pallas
packet-traversal kernel (ops/traverse.py) consumes.

Layout (chosen from on-chip microbenchmarks — see ops/traverse.py docstring):

* ``nodes``: (ceil(Mi/8), 128) float32 — eight internal nodes per row,
  16 lanes each.  Node record (lanes 16*j .. 16*j+13):
      [0:3]  left-child AABB min      [3:6]  left-child AABB max
      [6:9]  right-child AABB min     [9:12] right-child AABB max
      [12]   left link                [13]   right link
  Links are stored as exact small floats: ``link >= 0`` is an internal-node
  ordinal, ``link < 0`` is ``-(leaf_ordinal + 1)``.
* ``leaves``: (L, 128) float32 — one leaf per row, ``leaf_size`` triangles
  at lanes 9*k .. 9*k+9 as [v0, e1, e2].  Padding slots are all-zero
  (degenerate => det == 0 => never hit, same convention as SceneArrays).
  A leaf's global slot base is ``leaf_ordinal * leaf_size`` — identical to
  the SceneArrays padded-slot indexing, so hits from the packet kernel and
  the jnp reference traversal are interchangeable.

The reference's analog of this file is main.js:360-392 (flattening the BVH
into padded float textures for texelFetch); here the flattening targets VMEM
rows fetched with dynamic row slices.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PackedBVH(NamedTuple):
    nodes: np.ndarray      # (R, 128) f32
    leaves: np.ndarray     # (L, 128) f32
    # 1 row of metadata kept host-side (static python ints):
    # stored on Scene, not here


def pack_bvh(node_left, node_right, node_tri, node_min, node_max,
             tri_v0, tri_e1, tri_e2, leaf_size: int) -> PackedBVH:
    """Convert the SceneArrays-style BVH (per-node bbox, DFS preorder,
    tri_offset >= 0 marking leaves) into child-box packed tables."""
    if leaf_size * 9 > 128:
        raise ValueError(f"leaf_size {leaf_size} needs {leaf_size * 9} lanes")
    node_left = np.asarray(node_left)
    node_right = np.asarray(node_right)
    node_tri = np.asarray(node_tri)
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    m = len(node_left)
    is_leaf = node_tri >= 0

    # leaf ordinal: tri_offset / leaf_size (offsets are leaf_size-aligned)
    leaf_ord = np.where(is_leaf, node_tri // leaf_size, -1)
    n_leaves = int(is_leaf.sum())

    # internal ordinals in original (DFS preorder) order
    internal_ord = np.cumsum(~is_leaf) - 1
    internal_ord = np.where(is_leaf, -1, internal_ord)
    n_internal = int((~is_leaf).sum())

    def link(child):
        return np.where(is_leaf[child],
                        -(leaf_ord[child] + 1.0),
                        internal_ord[child].astype(np.float64))

    if n_internal == 0:
        # single-leaf scene: synthesize a root whose two children are both
        # leaf 0 (the duplicate child can never improve the hit)
        rows = np.zeros((1, 128), np.float32)
        rows[0, 0:3] = node_min[0]
        rows[0, 3:6] = node_max[0]
        rows[0, 6:9] = node_min[0]
        rows[0, 9:12] = node_max[0]
        rows[0, 12] = -1.0
        rows[0, 13] = -1.0
        nodes_flat = rows.reshape(1, 128)
    else:
        ids = np.flatnonzero(~is_leaf)
        rec = np.zeros((n_internal, 16), np.float32)
        l = node_left[ids]
        r = node_right[ids]
        rec[:, 0:3] = node_min[l]
        rec[:, 3:6] = node_max[l]
        rec[:, 6:9] = node_min[r]
        rec[:, 9:12] = node_max[r]
        rec[:, 12] = link(l)
        rec[:, 13] = link(r)
        pad_rows = (-n_internal) % 8
        if pad_rows:
            rec = np.concatenate(
                [rec, np.zeros((pad_rows, 16), np.float32)], axis=0)
        nodes_flat = rec.reshape(-1, 128)

    # leaves: slot order is already leaf-contiguous
    s = len(tri_v0)
    tri9 = np.concatenate(
        [np.asarray(tri_v0, np.float32), np.asarray(tri_e1, np.float32),
         np.asarray(tri_e2, np.float32)], axis=1)          # (S, 9)
    assert s == n_leaves * leaf_size, (s, n_leaves, leaf_size)
    leaves = np.zeros((max(n_leaves, 1), 128), np.float32)
    leaves[:n_leaves, : leaf_size * 9] = tri9.reshape(n_leaves,
                                                      leaf_size * 9)
    return PackedBVH(nodes=nodes_flat, leaves=leaves)
