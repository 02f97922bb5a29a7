"""On-device BVH refit for transform-only animation (scene/refit.py;
SURVEY §7.1 "scene edits/animation don't round-trip to host").

Contracts:
  1. identity delta reproduces the base tables (box recomputation is
     allclose; packed leaf triangle rows are exact);
  2. a refit frame renders the same image as a full host rebuild of that
     frame (both trees bound the same geometry, so hits — and therefore
     shading and RNG streams — agree; only fp association differs);
  3. the animation driver's refit path produces the same frames as the
     rebuild path end-to-end.

Reference analog being replaced: per-frame page reload + re-ingest of
animated_props (/root/reference/main.js:859-871).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fspt_tpu.config import RenderConfig
from fspt_tpu.runtime.renderer import Renderer
from fspt_tpu.scene.refit import (build_refit_aux, delta_affines,
                                  prop_affine, refit_arrays)
from fspt_tpu.scene.schema import load_scene_dict
from fspt_tpu.testing import DictAssetLoader, icosphere_obj, quad_obj


def _loader():
    return DictAssetLoader(
        texts={"sphere.obj": icosphere_obj(1), "floor.obj": quad_obj()})


def _scene_dict(translate, angle=0.0, scale=0.4):
    return {
        "environment": [[0.2, 0.2, 0.3], [0.8, 0.9, 1.0]],
        "cameraPos": [0.0, 0.4, 2.2],
        "cameraDir": [0.0, -0.18, -0.98],
        "samples": 8,
        "props": [
            {"path": "floor.obj", "scale": 6.0, "translate": [0, -0.5, 0],
             "diffuse": [0.6, 0.6, 0.6],
             "metallicRoughness": [0.0, 0.6, 0.0], "normals": "flat"},
        ],
        "animated_props": [
            {"path": "sphere.obj", "scale": scale, "translate": translate,
             "rotate": [{"axis": [0, 1, 0], "angle": angle}],
             "diffuse": [0.9, 0.4, 0.3],
             "metallicRoughness": [0.0, 0.3, 0.0], "normals": "smooth"},
        ],
    }


def test_prop_affine_matches_pipeline():
    """The probed affine must reproduce apply_prop_transforms on points."""
    from fspt_tpu.scene.transforms import apply_prop_transforms
    prop = {"rotate": [{"axis": [0.3, 1.0, 0.2], "angle": 0.7}],
            "scale": 1.7, "translate": [0.2, -0.4, 1.0]}
    A = prop_affine(prop)
    pts = np.random.default_rng(0).normal(size=(50, 3))
    want = apply_prop_transforms(pts, prop["rotate"], prop["scale"],
                                 prop["translate"])
    got = pts @ A[:, :3].T + A[:, 3]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_refit_identity_reproduces_tables():
    scene = load_scene_dict(_scene_dict([0.0, 0.0, 0.0]), _loader())
    aux = build_refit_aux(scene)
    P = scene.build["n_props"]
    mats = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    trans = np.zeros((P, 3), np.float32)
    a = scene.device_arrays()
    out = refit_arrays(a, scene.meta, aux, mats, trans)
    np.testing.assert_array_equal(np.asarray(out.pk_leaves),
                                  np.asarray(a.pk_leaves))
    np.testing.assert_allclose(np.asarray(out.pk_nodes),
                               np.asarray(a.pk_nodes), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.node_min),
                               np.asarray(a.node_min), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.node_max),
                               np.asarray(a.node_max), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.nrm0.x),
                               np.asarray(a.nrm0.x), atol=1e-6)


def test_refit_matches_rebuild_render():
    """Move + spin the animated prop: refit from the base frame must
    render the same image as a full host rebuild of the moved frame."""
    base_sd = _scene_dict([0.0, 0.0, 0.0])
    moved_sd = _scene_dict([0.35, 0.15, -0.2], angle=0.8)
    loader = _loader()
    base = load_scene_dict(base_sd, loader)
    moved = load_scene_dict(moved_sd, loader)

    aux = build_refit_aux(base)
    from fspt_tpu.scene.schema import _prop_defaults, merge_scene_props
    mats, trans = delta_affines(
        [_prop_defaults(p) for p in merge_scene_props(base_sd)],
        [_prop_defaults(p) for p in merge_scene_props(moved_sd)])
    refit = refit_arrays(base.device_arrays(), base.meta, aux, mats, trans)

    cfg = RenderConfig(width=16, height=16, bounces=2,
                       extra_refraction_iters=0, batch_spp=1, seed=3)
    rb = Renderer(moved, cfg).step(2)
    rr = Renderer(base, cfg)
    rr.arrays = jax.device_put(refit)
    rr.step(2)
    img_rebuild = rb.hdr_image()
    img_refit = rr.hdr_image()
    assert np.isfinite(img_refit).all()
    # identical estimator up to traversal fp association: refit derives
    # edge vectors as M @ e (f32) where rebuild re-subtracts transformed
    # vertices, so silhouette-edge samples can land a few ulps apart —
    # bound the tail rather than every pixel
    diff = np.abs(img_refit - img_rebuild)
    assert diff.mean() < 1e-4, diff.mean()
    assert np.quantile(diff, 0.98) < 5e-3
    assert diff.max() < 0.05


def test_refit_rejects_normalized_scenes():
    sd = _scene_dict([0.0, 0.0, 0.0])
    sd["normalize"] = 1.0
    scene = load_scene_dict(sd, _loader())
    with pytest.raises(ValueError, match="normalize"):
        build_refit_aux(scene)


def test_render_animation_refit_matches_rebuild(tmp_path):
    from fspt_tpu.io.image import read_png
    from fspt_tpu.runtime.animation import render_animation
    sd = _scene_dict([0.0, 0.0, 0.0])
    sd["animated_props"][0]["keyframes"] = [
        {"frame": 0, "translate": [0.0, 0.0, 0.0]},
        {"frame": 2, "translate": [0.4, 0.2, 0.0],
         "rotate": [{"axis": [0, 1, 0], "angle": 1.0}]},
    ]
    cfg = RenderConfig(width=16, height=16, bounces=2,
                       extra_refraction_iters=0, batch_spp=1, seed=5)
    a = render_animation(sd, _loader(), str(tmp_path / "rebuild"),
                         range(2), config=cfg, samples=2)
    b = render_animation(sd, _loader(), str(tmp_path / "refit"),
                         range(2), config=cfg, samples=2, refit=True)
    for pa, pb in zip(a, b):
        ia = read_png(pa)
        ib = read_png(pb)
        # 8-bit PNGs of the same estimator: at most quantization + the
        # occasional fp-edge sample flip
        assert np.mean(np.abs(ia - ib)) < 2.0 / 255.0
        assert np.quantile(np.abs(ia - ib), 0.99) <= 4.0 / 255.0
