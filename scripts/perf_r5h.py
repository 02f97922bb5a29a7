#!/usr/bin/env python
"""Round-5: tree-shape A/B under the multi-pop kernel.

The latency-floor model changes leaf-size economics: drain substeps pay
~the same serial cost regardless of MT count, so fewer/bigger leaf rows
should now win where they washed under the fused kernel (perf_r5a).
Also tests the full-sweep SAH builder vs the binned default (better
split quality -> fewer visits?).

Usage: PYTHONPATH=/root/repo:/root/.axon_site:scripts python scripts/perf_r5h.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from r5common import drain, timed

from fspt_tpu.config import RenderConfig
from fspt_tpu.core.camera import generate_rays
from fspt_tpu.core.integrator import trace_paths_batched
from fspt_tpu.core.rng import sample_key, stream_uniforms
from fspt_tpu.core.vec import V3
from fspt_tpu.runtime.layout import tile_order
from fspt_tpu.runtime.renderer import CameraState
from fspt_tpu.testing import make_bunny_standin_scene


def main():
    size, K = 512, 8
    n = size * size
    pixel_idx = jnp.asarray(tile_order(size, size), jnp.int32)
    base_key = sample_key(jax.random.key(0), 0)
    cfg = RenderConfig(width=size, height=size, bounces=8,
                       extra_refraction_iters=0, batch_spp=K,
                       compact=True, wavefront_batch=True, sort_state=True,
                       intersector="split", nee_env_nearest=True,
                       escape_env_nearest=True,
                       compact_schedule=(1.5, 11, 48, 160, 640,
                                         2048, 2048, 2048))
    rays_cached = None
    import fspt_tpu.scene.schema as schema
    for name, leaf, builder in (("binned l8 (ship)", 8, "auto"),
                                ("binned l12", 12, "auto"),
                                ("binned l14", 14, "auto"),
                                ("sweep  l8", 8, "sweep")):
        import fspt_tpu.testing as T
        from fspt_tpu.scene.schema import load_scene_dict
        loader = T.DictAssetLoader(
            texts={"bunny.obj": T.icosphere_obj(6),
                   "floor.obj": T.quad_obj()},
            images={"sky.rgbe.png": T.sky_rgbe(1024, 512),
                    "checker.png": T.checker_texture(256)})
        sd = {
            "environment": "sky.rgbe.png", "environmentTheta": 1.66,
            "cameraPos": [-0.751, 0.665, 1.82],
            "cameraDir": [0.304, -0.489, -0.818],
            "samples": 2000, "atlasRes": 256,
            "props": [
                {"path": "bunny.obj", "scale": 0.35,
                 "translate": [0.1, -0.2, 0], "diffuse": [1, 1, 1],
                 "metallicRoughness": [0, 0.1, 0], "ior": 1.4,
                 "normals": "smooth"},
                {"path": "floor.obj", "scale": 4,
                 "translate": [0, -0.75, 0], "diffuse": "checker.png",
                 "metallicRoughness": [0.0, 0.5, 0.0], "normals": "flat"},
            ],
        }
        scene = load_scene_dict(sd, loader, leaf_size=leaf, builder=builder,
                                env_bins_cap=256, name=name)
        arrays, meta = scene.device_arrays(), scene.meta
        cam = CameraState.from_config(scene.camera)
        if rays_cached is None:
            def rays(k):
                cam_u = stream_uniforms(k, 0, (4, n))
                return generate_rays(
                    cam.position, cam.direction, cam.fov_scale,
                    cam.focal_depth, cam.aperture, (size, size), cam_u,
                    pixel_idx=pixel_idx)
            per = [rays(jax.random.fold_in(base_key, i)) for i in range(K)]
            cat = lambda f: jnp.concatenate([f(o, d) for o, d in per])
            rays_cached = drain((
                V3(cat(lambda o, d: o.x), cat(lambda o, d: o.y),
                   cat(lambda o, d: o.z)),
                V3(cat(lambda o, d: d.x), cat(lambda o, d: d.y),
                   cat(lambda o, d: d.z))))
        O, D = rays_cached
        fn = jax.jit(lambda o, d, k, a=arrays, m=meta: trace_paths_batched(
            a, cfg, m, o, d, k, n_per=n, return_stats=True))
        r, st = fn(O, D, base_key)
        drain(r)
        t = timed(lambda o, d, k: fn(o, d, k), O, D, base_key,
                  reps=5) / K * 1e3
        vis = float(np.asarray(st.visits)[0]) / (K * n)
        print(f"{name:18s} {t:7.2f} ms/sample  visits_it0={vis:5.1f} "
              f"mean={float(np.asarray(r.x).mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
