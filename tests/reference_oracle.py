"""Pure-NumPy transcription of the reference estimator — the shared
correctness oracle demanded by SURVEY §4 / round-1 VERDICT item 3.

This is a direct, vectorized transcription of the reference megakernel
main() loop (reference shader/tracer.fs:436-518) plus the functions it
calls (:194-353, :406-434), written against the SAME scene arrays and the
SAME uniform streams as fspt_tpu.core.integrator.trace_paths — so the two
estimators must agree sample-for-sample (not just in distribution), up to
f32 rounding.  Intersection is brute-force Moller-Trumbore with the
reference's epsilon semantics (tracer.fs:300-315), i.e. the same oracle
intersector the integrator uses under cfg.intersector="brute".

Deliberate, documented deviations (shared with the integrator):
  * env radiance is decoded-then-filtered (the reference bilinearly filters
    raw RGBE bytes, tracer.fs:410-414 — wrong across exponent boundaries;
    see core/env.py docstring);
  * refraction-not-consuming-a-bounce (tracer.fs:488 `i--`) is expressed as
    a per-lane bounce budget over a fixed max_iters segment loop instead of
    GLSL's unbounded loop-variable decrement;
  * uniforms come from the passed-in streams, not fract(sin(seed)) hashes
    (tracer.fs:181,438,458).

Everything else follows the GLSL line by line (citations inline).
"""

from __future__ import annotations

import numpy as np

M_PI = 3.14159265
M_TAU = 2.0 * M_PI
INV_PI = 1.0 / M_PI
EPSILON = 1.0e-6      # tracer.fs:11
MAX_T = 1.0e5         # tracer.fs:10

f32 = np.float32


def _v3(arr_v3):
    """fspt V3 of (S,) planes -> (S, 3) float32."""
    return np.stack([np.asarray(arr_v3.x), np.asarray(arr_v3.y),
                     np.asarray(arr_v3.z)], axis=-1).astype(f32)


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


# --- intersection (tracer.fs:300-315 rayTriangleIntersect, brute) ----------

def brute_intersect(o, d, v0, e1, e2):
    """Nearest hit over all triangle slots. o/d: (N,3); v0/e1/e2: (S,3).
    Returns (t (N,), slot (N,) with -1 miss)."""
    p = np.cross(d[:, None, :], e2[None, :, :])
    det = _dot(e1[None], p)
    valid = np.abs(det) >= EPSILON
    inv = 1.0 / np.where(valid, det, 1.0)
    tv = o[:, None, :] - v0[None]
    u = _dot(tv, p) * inv
    q = np.cross(tv, e1[None])
    v = _dot(d[:, None, :], q) * inv
    t = _dot(e2[None], q) * inv
    hit = (valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > EPSILON))
    t = np.where(hit, t, MAX_T).astype(f32)
    slot = np.argmin(t, axis=1).astype(np.int32)
    tbest = t[np.arange(t.shape[0]), slot]
    slot = np.where(tbest < MAX_T, slot, -1)
    return tbest, slot


# --- BRDF suite (tracer.fs:194-298) ----------------------------------------

def mis_weights(a, b):
    """Power heuristic (tracer.fs:194-203)."""
    ok = (a > EPSILON) & (b > EPSILON)
    a2, b2 = a * a, b * b
    den = np.where(ok, a2 + b2, 1.0)
    return (np.where(ok, a2 / den, 1.0).astype(f32),
            np.where(ok, b2 / den, 0.0).astype(f32))


def gtr2(ndh, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndh * ndh
    return a2 / (M_PI * t * t)


def smith_g(ndv, alpha_g):
    # Matches fspt_tpu.core.brdf.smith_g's documented deviation from
    # tracer.fs:221-224: 0 (not +inf) for backfacing directions, so
    # inf * 0 NaNs cannot poison the estimator.
    a = alpha_g * alpha_g
    b = ndv * ndv
    denom = ndv + np.sqrt(np.maximum(a + b - a * b, 0.0))
    return np.where(denom > 1e-7, 1.0 / np.maximum(denom, 1e-7), 0.0)


def gtr2_pdf(incident, normal, roughness, bsdf_dir):
    """tracer.fs:227-233."""
    alpha = np.maximum(f32(0.001), roughness)
    h = _normalize(bsdf_dir + incident)
    cos_t = np.abs(_dot(h, normal))
    return (gtr2(cos_t, alpha) * cos_t
            / np.maximum(4.0 * np.abs(_dot(bsdf_dir, h)), 1e-12))


def schlick(incident, normal, n1, n2):
    """tracer.fs:239-254 with total internal reflection."""
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    cos_t = _dot(normal, incident)
    n = n1 / n2
    sin2 = n * n * (1.0 - cos_t * cos_t)
    tir = (n1 > n2) & (sin2 > 1.0)
    cos_t = np.where(n1 > n2, np.sqrt(np.maximum(1.0 - sin2, 0.0)), cos_t)
    x = 1.0 - cos_t
    return np.where(tir, 1.0, r0 + (1.0 - r0) * x ** 5).astype(f32)


def _onb(normal):
    """up = |n.z| < 0.999 ? z : x (tracer.fs:259-261)."""
    up = np.where(np.abs(normal[:, 2:3]) < 0.999,
                  np.array([[0.0, 0.0, 1.0]], f32),
                  np.array([[1.0, 0.0, 0.0]], f32))
    tangent = _normalize(np.cross(up, normal))
    return tangent, np.cross(normal, tangent)


def sample_microfacet(normal, roughness, r1, r2):
    """tracer.fs:256-270."""
    tangent, bitangent = _onb(normal)
    a = np.maximum(f32(0.001), roughness)
    phi = r1 * M_TAU
    cos_t = np.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_t = np.clip(np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0)), 0.0, 1.0)
    return (tangent * (sin_t * np.cos(phi))[:, None]
            + bitangent * (sin_t * np.sin(phi))[:, None]
            + normal * cos_t[:, None])


def sample_lambert(normal, r1, r2):
    """tracer.fs:205-213 cosineSampleHemisphere + :272-280 frame."""
    tangent, bitangent = _onb(normal)
    r = np.sqrt(r1)
    phi = M_TAU * r2
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    z = np.sqrt(np.maximum(0.0, 1.0 - x * x - y * y))
    return tangent * x[:, None] + bitangent * y[:, None] + normal * z[:, None]


def eval_specular(incident, normal, diffuse, metallic, roughness, bsdf_dir):
    """Gs * Fs * Ds (tracer.fs:282-294)."""
    ndl = _dot(normal, bsdf_dir)
    ndv = _dot(normal, incident)
    h = _normalize(bsdf_dir + incident)
    ndh = _dot(normal, h)
    ds = gtr2(ndh, np.maximum(f32(0.001), roughness))
    fs = diffuse * metallic[:, None] + (1.0 - metallic)[:, None]
    roughg = (roughness * 0.5 + 0.5) ** 2
    gs = smith_g(ndl, roughg) * smith_g(ndv, roughg)
    return fs * (gs * ds)[:, None]


def reflect(i, n):
    return i - n * (2.0 * _dot(n, i))[:, None]


def refract(i, n, eta):
    ndi = _dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    out = i * eta[:, None] - n * (eta * ndi + np.sqrt(np.maximum(k, 0.0)))[:, None]
    return np.where((k < 0.0)[:, None], 0.0, out).astype(f32)


# --- environment (tracer.fs:410-434) ----------------------------------------

def env_radiance(env_rgb, hw, d, theta):
    """envSample (tracer.fs:416-419) over decoded linear planes with GL
    LINEAR filtering: REPEAT in u, CLAMP_TO_EDGE in v (main.js:174-177)."""
    h, w = hw
    u = theta + np.arctan2(d[:, 2], d[:, 0]) / M_TAU
    v = np.arcsin(np.clip(-d[:, 1], -1.0, 1.0)) * INV_PI + 0.5
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = np.floor(x), np.floor(y)
    fx, fy = x - x0f, y - y0f
    x0 = np.mod(x0f.astype(np.int64), w)
    x1 = np.mod(x0 + 1, w)
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    idx = [(y0 * w + x0, (1 - fx) * (1 - fy)), (y0 * w + x1, fx * (1 - fy)),
           (y1 * w + x0, (1 - fx) * fy), (y1 * w + x1, fx * fy)]
    planes = _v3(env_rgb)
    out = np.zeros((d.shape[0], 3), f32)
    for i, wgt in idx:
        out += planes[i] * wgt[:, None].astype(f32)
    return out


def sample_env(bins, n_bins, hw, theta, r1, r2, r3):
    """sampleEnv (tracer.fs:421-434): uniform bin pick, uniform in box."""
    h, w = hw
    bx0, by0, bx1, by1 = (np.asarray(b, f32) for b in bins)
    nb = int(n_bins)
    idx = np.clip((nb * r1).astype(np.int32), 0, nb - 1)
    x0, y0 = bx0[idx], by0[idx]
    bw, bh = bx1[idx] - x0, by1[idx] - y0
    u = (-theta) + (bw * r2 + x0) / w
    v = (bh * r3 + y0) / h
    th = u * M_TAU
    phi = v * M_PI
    sin_phi = np.sin(phi)
    d = np.stack([np.cos(th) * sin_phi, np.cos(phi), np.sin(th) * sin_phi],
                 axis=-1).astype(f32)
    nominal = (w * h) / nb
    pdf = nominal / np.maximum(bw * bh * M_TAU * M_PI * sin_phi, 1e-12)
    return d, pdf.astype(f32)


# --- atlas (integrator atlas_fetch_rgb convention; the reference samples a
# GL TEXTURE_2D_ARRAY with REPEAT + LINEAR, tracer.fs:453-456) ---------------

def atlas_fetch(arrays, meta, layer, u, v):
    r = meta.atlas_res
    x = u * r - 0.5
    y = (1.0 - v) * r - 0.5
    x0f, y0f = np.floor(x), np.floor(y)
    fx, fy = x - x0f, y - y0f
    x0 = np.mod(x0f.astype(np.int64), r)
    x1 = np.mod(x0 + 1, r)
    y0 = np.mod(y0f.astype(np.int64), r)
    y1 = np.mod(y0 + 1, r)
    base = layer.astype(np.int64) * (r * r)
    planes = np.stack([np.asarray(arrays.atlas_r), np.asarray(arrays.atlas_g),
                       np.asarray(arrays.atlas_b)], axis=-1)
    out = np.zeros((u.shape[0], 3), f32)
    for xi, yi, wgt in ((x0, y0, (1 - fx) * (1 - fy)),
                        (x1, y0, fx * (1 - fy)),
                        (x0, y1, (1 - fx) * fy),
                        (x1, y1, fx * fy)):
        out += planes[base + yi * r + xi] * wgt[:, None].astype(f32)
    return out


# --- the megakernel main() loop (tracer.fs:436-518) -------------------------

def oracle_trace(arrays, meta, cfg, origin, direction, u_iters):
    """Trace one sample for N rays.

    arrays: SceneArrays (host numpy); cfg: RenderConfig; origin/direction:
    (N, 3) f32; u_iters: list of max_iters arrays, each (11, N) — the exact
    stream_uniforms(key, 1+it, (11, n)) streams the integrator consumes.
    Returns (N, 3) f32 radiance.
    """
    n = origin.shape[0]
    v0 = np.asarray(arrays.tri_v0, f32)
    e1 = np.asarray(arrays.tri_e1, f32)
    e2 = np.asarray(arrays.tri_e2, f32)
    env_hw = (meta.env_h, meta.env_w)
    theta = float(np.asarray(arrays.env_theta))
    bins = (arrays.bin_x0, arrays.bin_y0, arrays.bin_x1, arrays.bin_y1)
    nrm = [_v3(getattr(arrays, k)) for k in ("nrm0", "nrm1", "nrm2")]
    tan = [_v3(getattr(arrays, k)) for k in ("tan0", "tan1", "tan2")]
    btn = [_v3(getattr(arrays, k)) for k in ("btn0", "btn1", "btn2")]
    uv = [(np.asarray(getattr(arrays, f"uv{i}u"), f32),
           np.asarray(getattr(arrays, f"uv{i}v"), f32)) for i in range(3)]
    emit = _v3(arrays.emit)
    ior_tab = np.asarray(arrays.ior, f32)
    diel_tab = np.asarray(arrays.dielectric, f32)

    t, slot = brute_intersect(origin, direction, v0, e1, e2)
    miss = slot < 0
    color = np.where(miss[:, None],
                     env_radiance(arrays.env_rgb, env_hw, direction, theta),
                     0.0).astype(f32)
    acc = np.ones((n, 3), f32)                 # accumulatedReflectance
    active = ~miss
    bounces_used = np.zeros(n, np.int32)
    ray_o, ray_d = origin.copy(), direction.copy()

    for it in range(cfg.max_iters):
        u = np.asarray(u_iters[it], f32)
        s = np.maximum(slot, 0)

        # hit point + barycentric weights (tracer.fs:450-451, :339-353)
        p = ray_o + ray_d * t[:, None]
        vv2 = p - v0[s]
        d00 = _dot(e1[s], e1[s])
        d01 = _dot(e1[s], e2[s])
        d11 = _dot(e2[s], e2[s])
        d20 = _dot(vv2, e1[s])
        d21 = _dot(vv2, e2[s])
        den = d00 * d11 - d01 * d01
        inv = 1.0 / np.where(np.abs(den) > 1e-20, den, 1.0)
        bu = (d11 * d20 - d01 * d21) * inv      # weights corner 1
        bv = (d00 * d21 - d01 * d20) * inv      # weights corner 2
        w0 = 1.0 - bu - bv

        # barycentric texcoord + attribute fetches (tracer.fs:452-460)
        tex_u = uv[0][0][s] * w0 + uv[1][0][s] * bu + uv[2][0][s] * bv
        tex_v = uv[0][1][s] * w0 + uv[1][1][s] * bu + uv[2][1][s] * bv
        tex_diffuse = atlas_fetch(arrays, meta, arrays.map_d[s], tex_u, tex_v)
        tex_emissive = atlas_fetch(arrays, meta, arrays.map_e[s], tex_u, tex_v)
        mr = atlas_fetch(arrays, meta, arrays.map_mr[s], tex_u, tex_v)
        metallic = mr[:, 0]
        roughness = mr[:, 1] ** 2               # tracer.fs:457
        tn = atlas_fetch(arrays, meta, arrays.map_n[s], tex_u, tex_v)
        tex_normal = np.stack([(tn[:, 0] - 0.5) * 2.0,
                               (tn[:, 1] - 0.5) * 2.0, tn[:, 2]], -1)

        bary_n = nrm[0][s] * w0[:, None] + nrm[1][s] * bu[:, None] + nrm[2][s] * bv[:, None]
        bary_t = tan[0][s] * w0[:, None] + tan[1][s] * bu[:, None] + tan[2][s] * bv[:, None]
        bary_bt = btn[0][s] * w0[:, None] + btn[1][s] * bu[:, None] + btn[2][s] * bv[:, None]
        macro_n = _normalize(bary_t * tex_normal[:, 0:1]
                             + bary_bt * tex_normal[:, 1:2]
                             + bary_n * tex_normal[:, 2:3])

        inside = _dot(-ray_d, bary_n) < 0.0     # tracer.fs:461
        ior = ior_tab[s]
        diel = diel_tab[s]
        n1 = np.where(inside, ior, 1.0).astype(f32)
        n2 = np.where(inside, 1.0, ior).astype(f32)
        macro_n = np.where(inside[:, None], -macro_n, macro_n)
        offset_out = p + macro_n * (EPSILON * 2.0)

        # emissive (tracer.fs:467) + constant emittance (integrator superset;
        # zero in reference-parity scenes)
        color += np.where(active[:, None],
                          acc * tex_emissive * tex_diffuse
                          * cfg.emissive_scale + acc * emit[s], 0.0)

        incident = -ray_d
        micro_n = sample_microfacet(macro_n, roughness, u[0], u[1])
        env_dir, env_pdf = sample_env(bins, arrays.n_bins, env_hw, theta,
                                      u[2], u[3], u[4])
        cos_env = _dot(macro_n, env_dir)

        fresnel = schlick(incident, micro_n, n1, n2)
        p_spec = fresnel * (1.0 - metallic) + metallic   # tracer.fs:475
        specular = p_spec > u[5]
        refractive = ~specular & (diel >= 0.0)

        # specular branch (tracer.fs:476-480)
        spec_dir = reflect(-incident, micro_n)
        spec_pdf = gtr2_pdf(incident, macro_n, roughness, spec_dir)
        spec_tp = (eval_specular(incident, macro_n, tex_diffuse, metallic,
                                 roughness, spec_dir)
                   * (np.clip(_dot(macro_n, spec_dir), 0.0, 1.0)
                      / np.maximum(spec_pdf, 1e-12))[:, None])
        spec_env = (eval_specular(incident, macro_n, tex_diffuse, metallic,
                                  roughness, env_dir)
                    * (np.clip(cos_env, 0.0, 1.0) / env_pdf)[:, None])
        # refraction branch (tracer.fs:481-488)
        refr_dir = refract(ray_d, micro_n, n1 / n2)
        # diffuse branch (tracer.fs:489-493)
        diff_dir = sample_lambert(macro_n, u[6], u[7])
        diff_pdf = np.abs(_dot(diff_dir, macro_n)) * INV_PI
        diff_tp = (tex_diffuse * INV_PI
                   * (np.clip(_dot(macro_n, diff_dir), 0.0, 1.0)
                      / np.maximum(diff_pdf, 1e-12))[:, None])
        diff_env = (tex_diffuse * INV_PI
                    * (np.clip(cos_env, 0.0, 1.0) / env_pdf)[:, None])

        sel = specular[:, None]
        rsel = refractive[:, None]
        new_dir = np.where(sel, spec_dir, np.where(rsel, refr_dir, diff_dir))
        new_dir = _normalize(new_dir).astype(f32)
        bsdf_pdf = np.where(specular, spec_pdf,
                            np.where(refractive, 1.0, diff_pdf)).astype(f32)
        bsdf_tp = np.where(sel, spec_tp, np.where(rsel, 1.0, diff_tp))
        env_tp = np.where(sel, spec_env, np.where(rsel, 0.0, diff_env))
        new_origin = np.where(rsel, p - macro_n * (EPSILON * 2.0), offset_out)

        # Beer (tracer.fs:497)
        beer = np.maximum(1.0 - (1.0 - tex_diffuse) * (t * diel)[:, None], 0.0)
        bsdf_tp = np.where(inside[:, None], beer, bsdf_tp).astype(f32)

        w_env, w_bsdf = mis_weights(env_pdf, bsdf_pdf)

        # env NEE shadow ray (tracer.fs:499-505)
        shadow_wanted = active & (diel < 0.0) & (cos_env > 0.0)
        sh_t, sh_slot = brute_intersect(offset_out, env_dir, v0, e1, e2)
        nee = (acc * env_tp
               * env_radiance(arrays.env_rgb, env_hw, env_dir, theta)
               * w_env[:, None])
        color += np.where((shadow_wanted & (sh_slot < 0))[:, None], nee, 0.0)

        # scatter (tracer.fs:507-512)
        nt, nslot = brute_intersect(new_origin, new_dir, v0, e1, e2)
        acc = np.where(active[:, None], acc * bsdf_tp, acc).astype(f32)
        scat_miss = active & (nslot < 0)
        esc = (acc * env_radiance(arrays.env_rgb, env_hw, new_dir, theta)
               * w_bsdf[:, None])
        color += np.where(scat_miss[:, None], esc, 0.0)

        # bounce budget (integrator's expression of the `i--` rule)
        bounces_used = bounces_used + (active & ~refractive).astype(np.int32)
        ray_o = np.where(active[:, None], new_origin, ray_o)
        ray_d = np.where(active[:, None], new_dir, ray_d)
        t = np.where(active, nt, t)
        slot = np.where(active, nslot, slot)
        active = active & ~scat_miss & (bounces_used < cfg.bounces)

    return np.clip(color, 0.0, cfg.radiance_clamp)   # tracer.fs:515
