#!/usr/bin/env python
"""Minimal real-device Mosaic compile + correctness smoke of the v3 walk
kernel: tiny scene, one packet group, compare against the v1 kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke_v3.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fspt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.ops.traverse import packet_traverse
from fspt_tpu.ops.traverse3 import packet_traverse3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_test_scene


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    scene = make_test_scene(subdivisions=3)
    arrays = scene.device_arrays()
    meta = scene.meta
    cam = CameraState.from_config(scene.camera)
    size = 64
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    key = sample_key(jax.random.key(0), 0)
    cam_u = stream_uniforms(key, 0, (4, n))
    origin, direction = generate_rays(
        cam.position, cam.direction, cam.fov_scale, cam.focal_depth,
        cam.aperture, (size, size), cam_u, pixel_idx=pixel_idx)

    def run(impl):
        return jax.jit(lambda o, d: impl(
            arrays.pk_nodes, arrays.pk_leaves, o, d,
            leaf_size=meta.leaf_size,
            stack_depth=meta.pk_stack_depth))(origin, direction)

    t0 = time.time()
    h3 = jax.block_until_ready(run(packet_traverse3))
    print(f"v3 compiled+ran in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    h1 = jax.block_until_ready(run(packet_traverse))
    print(f"v1 compiled+ran in {time.time() - t0:.1f}s", flush=True)
    t3, s3 = np.asarray(h3.t), np.asarray(h3.slot)
    t1, s1 = np.asarray(h1.t), np.asarray(h1.slot)
    print("slot agree:", float((s3 == s1).mean()),
          "t max|diff|:", float(np.abs(t3 - t1).max()), flush=True)
    assert (s3 == s1).all(), "v3/v1 hit-slot mismatch on device"
    assert np.allclose(t3, t1, atol=1e-5), "v3/v1 hit-t mismatch on device"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
