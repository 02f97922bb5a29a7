"""The path-tracing integrator: a vectorized, differentiable re-design of the
reference's GLSL megakernel (reference shader/tracer.fs:436-518).

Estimator parity (same math, same sampling strategies, same MIS):
  * primary ray from camera textures -> here passed-in SoA ray batch
  * primary miss adds unweighted environment radiance (tracer.fs:442-443)
  * per shading iteration: barycentric hit attributes, atlas fetches
    (diffuse/emissive/metallicRoughness/normal), tangent-space normal mapping
    (tracer.fs:447-460), inside/IOR determination (:461-463), emissive add
    throughput * texEmissive * texDiffuse * emissive_scale (:467),
    lobe select by Schlick-Fresnel/metallic mix vs uniform (:475):
      - specular: GGX half-vector sample, reflect, GTR2 pdf (:476-480)
      - refraction when dielectric >= 0: pdf 1, does NOT consume a bounce
        (:481-488 — the GLSL `i--`), Beer's-law absorption when inside (:497)
      - diffuse: cosine hemisphere (:489-493)
    environment NEE with one bin-sampled env direction + shadow ray and
    power-heuristic MIS (:499-512); radiance clamp (:515).

TPU-native re-design vs the reference:
  * one ray per SoA lane instead of one GL thread per pixel; the bounce loop
    is a lax.scan with per-lane active masks and bounce budgets (refraction
    chains get `extra_refraction_iters` additional static iterations)
  * scatter + shadow rays are traced as ONE batched traversal of 2N rays per
    iteration (the reference walks the BVH twice sequentially)
  * counter-based RNG (core/rng.py) instead of fract(sin()) hashes
  * fully differentiable w.r.t. materials, atlas, env map, and camera:
    discrete events (hit selection, lobe choice, bin pick) are detached via
    stop_gradient; continuous factors carry gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fspt_tpu.config import RenderConfig
from fspt_tpu.core import brdf
from fspt_tpu.core.env import bilinear_wrap_x, env_radiance, sample_env_bins
from fspt_tpu.core.geometry import barycentric_weights, dot, normalize
from fspt_tpu.core.rng import stream_uniforms
from fspt_tpu.core.traversal import Hit, intersect_scene, intersect_scene_brute

sg = jax.lax.stop_gradient


def _intersect(scene, cfg: RenderConfig, origin, direction) -> Hit:
    if cfg.intersector == "brute":
        return intersect_scene_brute(scene, origin, direction, max_t=cfg.max_t)
    return intersect_scene(scene, origin, direction, leaf_size=cfg.leaf_size,
                           stack_depth=cfg.stack_depth, max_t=cfg.max_t)


def atlas_fetch(atlas, layer, uv):
    """Bilinear fetch from (L, R, R, 4) atlas with REPEAT wrap both axes;
    v=0 maps to the image bottom row (OBJ/GL convention; see scene/atlas.py).
    layer: (N,) i32; uv: (N, 2). Returns (N, 4)."""
    r = atlas.shape[1]
    u = uv[..., 0]
    v = 1.0 - uv[..., 1]
    x = u * r - 0.5
    y = v * r - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), r)
    x1 = jnp.mod(x0 + 1, r)
    y0 = jnp.mod(y0f.astype(jnp.int32), r)
    y1 = jnp.mod(y0 + 1, r)
    # flat per-texel gathers (4 texels/ray) — never materialize whole layers
    flat = atlas.reshape(-1, atlas.shape[-1])
    base = layer * (r * r)
    c00 = flat[base + y0 * r + x0]
    c10 = flat[base + y0 * r + x1]
    c01 = flat[base + y1 * r + x0]
    c11 = flat[base + y1 * r + x1]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


class PathState(NamedTuple):
    origin: jnp.ndarray        # (N, 3)
    direction: jnp.ndarray     # (N, 3)
    t: jnp.ndarray             # (N,) current-hit distance
    slot: jnp.ndarray          # (N,) current-hit slot (-1 miss)
    throughput: jnp.ndarray    # (N, 3) accumulated reflectance
    color: jnp.ndarray         # (N, 3)
    bounces_used: jnp.ndarray  # (N,) i32
    active: jnp.ndarray        # (N,) bool


def trace_paths(scene, cfg: RenderConfig, origin, direction, key):
    """Path-trace one sample for every input ray. Returns (N, 3) radiance."""
    n = origin.shape[0]
    env_hw = (scene.env.shape[0], scene.env.shape[1])

    primary = _intersect(scene, cfg, origin, direction)
    prim_slot = sg(primary.slot)
    prim_t = sg(primary.t)
    miss = prim_slot < 0
    color = jnp.where(miss[:, None],
                      env_radiance(scene.env, direction, scene.env_theta),
                      0.0)

    state = PathState(
        origin=origin, direction=direction, t=prim_t, slot=prim_slot,
        throughput=jnp.ones((n, 3), jnp.float32), color=color,
        bounces_used=jnp.zeros(n, jnp.int32), active=~miss)

    def body(state: PathState, it):
        u = stream_uniforms(key, 1 + it, (n, 8))
        new_state = _shade_and_scatter(scene, cfg, state, u, env_hw)
        return new_state, None

    state, _ = jax.lax.scan(body, state, jnp.arange(cfg.max_iters))
    return jnp.clip(state.color, 0.0, cfg.radiance_clamp)


def _shade_and_scatter(scene, cfg: RenderConfig, s: PathState, u, env_hw):
    n = s.origin.shape[0]
    active = s.active & (s.slot >= 0)
    slot = sg(jnp.maximum(s.slot, 0))

    # ---- gather hit attributes ----------------------------------------
    v0 = scene.tri_v0[slot]
    e1 = scene.tri_e1[slot]
    e2 = scene.tri_e2[slot]
    nrm = scene.nrm[slot]              # (N, 3corners, 3)
    tan = scene.tan[slot]
    btn = scene.btn[slot]
    uv3 = scene.uv[slot]               # (N, 3, 2)
    maps = scene.mat_maps[slot]        # (N, 4)
    emitt = scene.mat_emittance[slot]
    ior = scene.mat_ior[slot]
    dielectric = scene.mat_dielectric[slot]

    hit_p = s.origin + s.direction * s.t[:, None]
    bw = barycentric_weights(hit_p, v0, e1, e2)        # (N, 3)
    texcoord = jnp.einsum("nc,ncu->nu", bw, uv3)

    tex_diffuse = atlas_fetch(scene.atlas, maps[:, 0], texcoord)[:, :3]
    tex_emissive = atlas_fetch(scene.atlas, maps[:, 1], texcoord)[:, :3]
    tex_mr = atlas_fetch(scene.atlas, maps[:, 3], texcoord)[:, :2]
    tex_normal_rgb = atlas_fetch(scene.atlas, maps[:, 2], texcoord)[:, :3]
    tex_normal = (tex_normal_rgb - jnp.array([0.5, 0.5, 0.0])) \
        * jnp.array([2.0, 2.0, 1.0])
    metallic = tex_mr[:, 0]
    roughness = tex_mr[:, 1] ** 2                      # tracer.fs:457

    # ---- shading frame (tracer.fs:332-337,459-463) --------------------
    bary_n = jnp.einsum("nc,nck->nk", bw, nrm)
    bary_t = jnp.einsum("nc,nck->nk", bw, tan)
    bary_bt = jnp.einsum("nc,nck->nk", bw, btn)
    macro_n = normalize(tex_normal[:, 0:1] * bary_t
                        + tex_normal[:, 1:2] * bary_bt
                        + tex_normal[:, 2:3] * bary_n)
    inside = dot(-s.direction, bary_n) < 0.0
    n1 = jnp.where(inside, ior, 1.0)
    n2 = jnp.where(inside, 1.0, ior)
    macro_n = jnp.where(inside[:, None], -macro_n, macro_n)
    offset_out = hit_p + macro_n * (cfg.epsilon * 2.0)

    # ---- emissive (tracer.fs:467) -------------------------------------
    emit_add = s.throughput * tex_emissive * tex_diffuse * cfg.emissive_scale
    # constant per-prop emittance (lightBuffer-era; kept additive for working
    # area lights):
    emit_add = emit_add + s.throughput * emitt
    color = s.color + jnp.where(active[:, None], emit_add, 0.0)

    incident = -s.direction

    # ---- samples -------------------------------------------------------
    micro_n = brdf.sample_microfacet(macro_n, roughness,
                                     sg(u[:, 0]), sg(u[:, 1]))
    env_dir, env_pdf = sample_env_bins(scene.env_bins, scene.n_bins, env_hw,
                                       scene.env_theta,
                                       sg(u[:, 2]), sg(u[:, 3]), sg(u[:, 4]))
    env_dir = sg(env_dir)
    cos_env = dot(macro_n, env_dir)

    fresnel = brdf.schlick(incident, micro_n, n1, n2)
    p_specular = fresnel * (1.0 - metallic) + metallic   # mix(f, 1, metallic)
    specular = sg(p_specular) > u[:, 5]
    refractive = ~specular & (dielectric >= 0.0)
    diffuse_lobe = ~specular & ~refractive

    # specular branch
    spec_dir = brdf.reflect(-incident, micro_n)
    spec_pdf = brdf.gtr2_pdf(incident, macro_n, roughness, spec_dir)
    spec_bsdf = (brdf.eval_specular(incident, macro_n, tex_diffuse, metallic,
                                    roughness, spec_dir)
                 * jnp.clip(dot(macro_n, spec_dir), 0.0, 1.0)[:, None]
                 / jnp.maximum(sg(spec_pdf), 1e-12)[:, None])
    spec_env = (brdf.eval_specular(incident, macro_n, tex_diffuse, metallic,
                                   roughness, env_dir)
                * jnp.clip(cos_env, 0.0, 1.0)[:, None]
                / env_pdf[:, None])

    # refraction branch
    refr_dir = brdf.refract(s.direction, micro_n, n1 / n2)
    # diffuse branch
    diff_dir = brdf.sample_lambert(macro_n, sg(u[:, 6]), sg(u[:, 7]))
    diff_pdf = brdf.lambert_pdf(macro_n, diff_dir)
    diff_bsdf = (brdf.eval_lambert(tex_diffuse)
                 * jnp.clip(dot(macro_n, diff_dir), 0.0, 1.0)[:, None]
                 / jnp.maximum(sg(diff_pdf), 1e-12)[:, None])
    diff_env = (brdf.eval_lambert(tex_diffuse)
                * jnp.clip(cos_env, 0.0, 1.0)[:, None]
                / env_pdf[:, None])

    new_dir = jnp.where(specular[:, None], spec_dir,
                        jnp.where(refractive[:, None], refr_dir, diff_dir))
    new_dir = sg(normalize(new_dir))
    bsdf_pdf = jnp.where(specular, spec_pdf,
                         jnp.where(refractive, 1.0, diff_pdf))
    bsdf_throughput = jnp.where(
        specular[:, None], spec_bsdf,
        jnp.where(refractive[:, None], 1.0, diff_bsdf))
    env_throughput = jnp.where(
        specular[:, None], spec_env,
        jnp.where(refractive[:, None], 0.0, diff_env))
    new_origin = jnp.where(refractive[:, None],
                           hit_p - macro_n * (cfg.epsilon * 2.0), offset_out)

    # Beer's-law-ish absorption when exiting a medium (tracer.fs:497) —
    # replaces the lobe throughput whenever the hit was on the inside.
    beer = jnp.maximum(
        1.0 - (1.0 - tex_diffuse) * (s.t * dielectric)[:, None], 0.0)
    bsdf_throughput = jnp.where(inside[:, None], beer, bsdf_throughput)

    w_env, w_bsdf = brdf.mis_weights(env_pdf, sg(bsdf_pdf))

    # ---- combined scatter + shadow traversal (2N rays) ----------------
    shadow_wanted = active & (dielectric < 0.0) & (cos_env > 0.0)
    # park finished/irrelevant lanes far outside the scene so their walk
    # terminates on the root test
    park = jnp.array([1.0e8, 1.0e8, 1.0e8], jnp.float32)
    scat_o = jnp.where(active[:, None], new_origin, park)
    scat_d = jnp.where(active[:, None], new_dir,
                       jnp.array([0.0, 1.0, 0.0]))
    shad_o = jnp.where(shadow_wanted[:, None], offset_out, park)
    shad_d = jnp.where(shadow_wanted[:, None], env_dir,
                       jnp.array([0.0, 1.0, 0.0]))
    both = _intersect(scene, cfg,
                      jnp.concatenate([scat_o, shad_o], axis=0),
                      jnp.concatenate([scat_d, shad_d], axis=0))
    nxt_t = sg(both.t[:n])
    nxt_slot = sg(both.slot[:n])
    shadow_open = sg(both.slot[n:]) < 0

    # ---- NEE env contribution (tracer.fs:499-505) ----------------------
    nee = (s.throughput * env_throughput
           * env_radiance(scene.env, env_dir, scene.env_theta)
           * w_env[:, None])
    color = color + jnp.where((shadow_wanted & shadow_open)[:, None], nee, 0.0)

    throughput = jnp.where(active[:, None],
                           s.throughput * bsdf_throughput, s.throughput)

    # ---- scatter-ray env hit (tracer.fs:509-512) -----------------------
    scat_miss = active & (nxt_slot < 0)
    esc = (throughput * env_radiance(scene.env, new_dir, scene.env_theta)
           * w_bsdf[:, None])
    color = color + jnp.where(scat_miss[:, None], esc, 0.0)

    # ---- bookkeeping ----------------------------------------------------
    bounces_used = s.bounces_used + (active & ~refractive).astype(jnp.int32)
    still_active = active & ~scat_miss & (bounces_used < cfg.bounces)

    return PathState(
        origin=jnp.where(active[:, None], new_origin, s.origin),
        direction=jnp.where(active[:, None], new_dir, s.direction),
        t=jnp.where(active, nxt_t, s.t),
        slot=jnp.where(active, nxt_slot, s.slot),
        throughput=throughput,
        color=color,
        bounces_used=bounces_used,
        active=still_active,
    )


def trace_heatmap(scene, cfg: RenderConfig, origin, direction):
    """BVH traversal-cost heatmap (reference mode=test, bvh_test.fs:224-232):
    per-ray node-visit count scaled by heatmap_scale as grayscale."""
    hit = intersect_scene(scene, origin, direction, leaf_size=cfg.leaf_size,
                          stack_depth=cfg.stack_depth, max_t=cfg.max_t)
    v = hit.visits.astype(jnp.float32) * cfg.heatmap_scale
    return jnp.stack([v, v, v], axis=-1)
