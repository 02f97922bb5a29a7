"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.dist import (make_mesh, make_sharded_sample_step,
                                    make_train_step, shard_accum,
                                    split_params)
from fspt_tpu.runtime.renderer import CameraState, Renderer


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _cfg(**kw):
    base = dict(width=16, height=16, bounces=2, extra_refraction_iters=1,
                batch_spp=1, seed=0)
    base.update(kw)
    return RenderConfig(**base)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


@pytest.mark.parametrize("sort_state", [False, True])
def test_sharded_render_matches_single_device_per_pixel(small_scene, mesh,
                                                        sort_state):
    """The sharded step draws the SAME per-pixel RNG streams as the
    single-device renderer (lane-indexed counter RNG, core/rng.py), so the
    8-way sharded render must equal the local render per pixel — a badly
    broken shard cannot hide in image statistics (round-2 VERDICT item 8).
    Parametrized over sort_state: the round-4 state-order coherence sort
    permutes lanes within each shard, and since all per-lane randomness is
    keyed by the explicit global lane id, per-pixel equality must survive
    it."""
    cfg = _cfg(sort_state=sort_state)
    arrays = small_scene.device_arrays()
    cam = CameraState.from_config(small_scene.camera)
    n = cfg.width * cfg.height
    step = make_sharded_sample_step(mesh, cfg, small_scene.meta)
    accum = shard_accum(jnp.zeros((3, n), jnp.float32), mesh)
    count = jnp.zeros(())
    key = jax.random.key(cfg.seed)
    n_samples = 4
    shard_rays = None
    for i in range(n_samples):
        accum, count, shard_rays = step(arrays, cam, accum, count, key, i)
    sharded = np.asarray(accum) / float(count)
    assert np.isfinite(sharded).all()
    assert shard_rays.shape == (8,) and float(np.asarray(shard_rays).min()) > 0

    r = Renderer(small_scene, cfg)
    r.step(n_samples)
    single = np.asarray(r.accum) / n_samples
    # scatter both to pixel-id space (the sharded step deals chunks of the
    # tile order round-robin to shards, so its column order differs)
    img_sharded = np.zeros_like(sharded)
    img_sharded[:, step.pixel_order] = sharded
    img_single = np.zeros_like(single)
    img_single[:, np.asarray(r.pixel_idx)] = single
    np.testing.assert_allclose(img_sharded, img_single, rtol=1e-5, atol=1e-6)


def test_train_step_produces_finite_psum_grads(small_scene, mesh):
    cfg = _cfg(width=16, height=8, bounces=1, extra_refraction_iters=0)
    arrays = small_scene.device_arrays()
    cam = CameraState.from_config(small_scene.camera)
    n = cfg.width * cfg.height
    train = make_train_step(mesh, cfg, small_scene.meta)
    params = split_params(arrays)
    cam_params = {"position": cam.position, "direction": cam.direction}
    target = shard_accum(jnp.full((3, n), 0.25, jnp.float32), mesh)
    loss, grads, cam_grads = train(params, cam_params, arrays, cam, target,
                                   jax.random.key(1), 0)
    assert np.isfinite(float(loss))
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least one material gradient is nonzero (diffuse-on-emittance path)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0.0


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
