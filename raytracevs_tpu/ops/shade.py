"""Shading: BRDF, sky, checker albedo, direct lighting with soft shadows.

Vectorized ports of the reference's shading math:
- GGX D / Smith G / Fresnel-Schlick / Cook-Torrance (Common.hlsli:620-697)
- procedural sky gradient (Common.hlsli:699-755)
- plane checkerboard with exponential distance fade (ClosestHit.hlsl:77-95)
- dominant-light selection for shadow budgeting (Common.hlsli:982-1079)
- area-light soft shadows with SIGMA penumbra packing (Common.hlsli:1199-1357)
- the RayGen direct-lighting loop (RayGen.hlsl:277-539)

Everything operates on [N]-shaped lane arrays; the light axis (static
capacity) is reduced with unrolled loops so XLA fuses the whole shade into
a handful of elementwise kernels.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from . import intersect, sampling

F32 = jnp.float32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def luminance(color):
    """Rec.709 luminance (Common.hlsli:563-566)."""
    return color[..., 0] * 0.2126 + color[..., 1] * 0.7152 + color[..., 2] * 0.0722


def compute_attenuation(dist, const_term, linear_term, quad_term):
    """Configurable attenuation (Common.hlsli:575-578)."""
    return 1.0 / jnp.maximum(const_term + linear_term * dist + quad_term * dist * dist, 1e-4)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def fresnel_schlick(cos_theta, f0):
    """Scalar Fresnel-Schlick (Common.hlsli:598-601)."""
    return f0 + (1.0 - f0) * _pow5(1.0 - cos_theta)


def fresnel_schlick3(vdoth, f0):
    """float3 Fresnel-Schlick (Common.hlsli:662-665)."""
    return f0 + (1.0 - f0) * _pow5(jnp.clip(1.0 - vdoth, 0.0, 1.0))[..., None]


def ggx_d(ndoth, roughness):
    """GGX/Trowbridge-Reitz NDF (Common.hlsli:621-627)."""
    a = roughness * roughness
    a2 = a * a
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (jnp.float32(C.PI) * denom * denom + 1e-4)


def smith_g1(ndotv, k):
    return ndotv / (ndotv * (1.0 - k) + k)


def smith_g(ndotv, ndotl, roughness):
    """Smith geometry, direct-lighting remap (Common.hlsli:638-643)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return smith_g1(ndotv, k) * smith_g1(ndotl, k)


def smith_g_ibl(ndotv, ndotl, roughness):
    """Smith geometry, IBL remap (Common.hlsli:648-653)."""
    a = roughness * roughness
    k = a / 2.0
    return smith_g1(ndotv, k) * smith_g1(ndotl, k)


def cook_torrance_specular(n, v, l, f0, roughness):
    """Cook-Torrance specular BRDF (Common.hlsli:669-691)."""
    h = _norm(v + l)
    ndotl = jnp.maximum(_dot(n, l), 0.001)
    ndotv = jnp.maximum(_dot(n, v), 0.001)
    ndoth = jnp.maximum(_dot(n, h), 0.0)
    vdoth = jnp.maximum(_dot(v, h), 0.0)
    d = ggx_d(ndoth, roughness)
    g = smith_g(ndotv, ndotl, roughness)
    f = fresnel_schlick3(vdoth, f0)
    return (d * g)[..., None] * f / (4.0 * ndotv * ndotl + 0.001)[..., None]


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def sky_color(direction):
    """Procedural atmospheric sky gradient (Common.hlsli:699-755).

    direction: [...,3]. Returns [...,3] linear sky color.
    """
    d = _norm(direction)
    elevation = d[..., 1]
    t = jnp.clip(elevation, 0.0, 1.0)
    t_below = jnp.clip(-elevation, 0.0, 1.0)

    zenith = jnp.array([0.15, 0.35, 0.75], F32)
    sky_mid = jnp.array([0.35, 0.55, 0.90], F32)
    horizon = jnp.array([0.70, 0.80, 0.95], F32)
    glow = jnp.array([0.95, 0.85, 0.70], F32)
    ground = jnp.array([0.25, 0.28, 0.35], F32)

    horizon_fade = _smoothstep(0.0, 0.15, t)[..., None]
    zenith_fade = _smoothstep(0.4, 1.0, t)[..., None]
    glow_i = (1.0 - _smoothstep(0.0, 0.08, t))[..., None]

    above = jnp.broadcast_to(horizon, d.shape)
    above = above + (glow - above) * (glow_i * 0.4)
    above = above + (sky_mid - above) * horizon_fade
    above = above + (zenith - above) * zenith_fade
    haze = (jnp.exp(-t * 8.0) * 0.3)[..., None]
    above = above + (horizon - above) * haze

    ground_fade = _smoothstep(0.0, 0.3, t_below)[..., None]
    below = horizon + (ground - horizon) * ground_fade
    below = below * (0.8 + (0.4 - 0.8) * ground_fade)

    return jnp.where(elevation[..., None] >= 0.0, above, below)


def checker_albedo(base_rgb, hit_position, cam_pos, cam_forward):
    """World-space plane checkerboard with distance fade (ClosestHit.hlsl:77-95)."""
    uv = hit_position[..., (0, 2)]
    view_z = jnp.maximum(_dot(hit_position - cam_pos, cam_forward), 0.0)
    fade = jnp.exp(-view_z / jnp.float32(C.CHECKER_FADE_DISTANCE))
    contrast = 0.3 + (1.0 - 0.3) * fade
    ix = jnp.floor(uv[..., 0]).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1]).astype(jnp.int32)
    checker = ((ix + iy) & 1).astype(F32)
    value = 0.5 + (checker - 0.5) * contrast
    dark = jnp.array([0.1, 0.1, 0.1], F32)
    bright = jnp.array([0.9, 0.9, 0.9], F32)
    return dark + (bright - dark) * value[..., None]


def sigma_pack_penumbra_local(d_occ, d_light, light_size):
    """SIGMA penumbra, local light (NRDEncoding.hlsli:188-194)."""
    size = light_size * d_occ / jnp.maximum(d_light - d_occ, jnp.float32(C.NRD_EPS))
    radius = size * 0.5
    return jnp.where(
        d_occ >= C.NRD_FP16_MAX,
        jnp.float32(C.NRD_FP16_MAX),
        jnp.minimum(radius, jnp.float32(C.SIGMA_PENUMBRA_ABSOLUTE_MAX)),
    )


def sigma_pack_penumbra_directional(d_occ, tan_angular_radius):
    """SIGMA penumbra, infinite light (NRDEncoding.hlsli:177-183)."""
    radius = d_occ * tan_angular_radius * 0.5
    return jnp.where(
        d_occ >= C.NRD_FP16_MAX,
        jnp.float32(C.NRD_FP16_MAX),
        jnp.minimum(radius, jnp.float32(C.SIGMA_PENUMBRA_ABSOLUTE_MAX)),
    )


class ShadowResult(NamedTuple):
    visibility: jnp.ndarray  # [N]
    penumbra: jnp.ndarray  # [N]
    occluder_distance: jnp.ndarray  # [N]
    shadow_color: jnp.ndarray  # [N,3]
    rays: jnp.ndarray  # [N] i32, number of shadow rays traced (for Mrays/s)


def _masked_random(state, active):
    new = sampling.pcg_hash(state)
    value = (new >> jnp.uint32(8)).astype(F32) * F32(1.0 / 16777216.0)
    return jnp.where(active, new, state), value


def calculate_soft_shadow(
    scene, hit_pos, normal, active, lt_type, lt_position, lt_radius, lt_samples, seed,
    max_samples: int,
):
    """CalculateSoftShadow for one (gathered) light per lane (Common.hlsli:1199-1357).

    lt_* are per-lane gathered light parameters. `active` masks lanes where a
    shadow is actually computed (top light with NdotL>0). Returns
    (new_seed, ShadowResult). Seed advances only on lanes that sample,
    matching the reference's sequential RNG consumption.

    Hard (radius <= 0.001) and soft lanes share one trace per loop
    iteration: hard lanes degenerate to the light-center direction on
    iteration 0 and consume no randoms, which is exactly the reference's
    hard-shadow path with half the scene passes.
    """
    n = hit_pos.shape[0]
    is_dir = lt_type == C.LIGHT_TYPE_DIRECTIONAL
    is_ambient = lt_type == C.LIGHT_TYPE_AMBIENT
    soft = lt_radius > 0.001
    origin = hit_pos + normal * jnp.float32(C.SHADOW_NORMAL_OFFSET)

    dir_point = lt_position - hit_pos
    dist_point = jnp.linalg.norm(dir_point, axis=-1)
    l_point = dir_point / jnp.maximum(dist_point[:, None], 1e-12)
    l_dir = _norm(-lt_position)  # directional: direction stored in position
    hard_dir = jnp.where(is_dir[:, None], l_dir, l_point)
    hard_dist = jnp.where(is_dir, F32(10000.0), dist_point)

    num_samples = jnp.clip(lt_samples.astype(jnp.int32), 1, 16)
    light_dist_center = dist_point
    light_size = lt_radius * 2.0
    tan_ang = jnp.tan(lt_radius)
    # Point lights build the basis toward the light center inside
    # SampleSphericalLight; directional lights perpendicular to the light dir.
    to_light_dir = _norm(dir_point)
    t_p, b_p = sampling.build_orthonormal_basis(to_light_dir)
    t_d, b_d = sampling.build_orthonormal_basis(l_dir)

    vis_sum = jnp.zeros((n,), F32)
    pen_sum = jnp.zeros((n,), F32)
    min_occ = jnp.full((n,), C.NRD_FP16_MAX, F32)
    occluded = jnp.zeros((n,), jnp.int32)
    valid_samples = jnp.zeros((n,), jnp.int32)
    color_sum = jnp.zeros((n, 3), F32)
    vis_h = jnp.ones((n,), F32)
    color_h = jnp.ones((n, 3), F32)
    occ_h = jnp.full((n,), C.NRD_FP16_MAX, F32)
    rays = jnp.zeros((n,), jnp.int32)

    shadowed = active & ~is_ambient
    soft_active = shadowed & soft
    hard_active = shadowed & ~soft
    for s in range(max_samples):
        iter_soft = soft_active & (s < num_samples)
        seed, u1 = _masked_random(seed, iter_soft)
        seed, u2 = _masked_random(seed, iter_soft)
        # RandomOnDisk (Common.hlsli:1086-1091)
        r = jnp.sqrt(u1)
        theta = u2 * F32(6.28318530718)
        dx = r * jnp.cos(theta)
        dy = r * jnp.sin(theta)

        # Point: sample on spherical light (Common.hlsli:1102-1116)
        sample_pos = lt_position + (t_p * dx[:, None] + b_p * dy[:, None]) * lt_radius[:, None]
        samp_vec = sample_pos - hit_pos
        samp_dist = jnp.linalg.norm(samp_vec, axis=-1)
        samp_dir_point = samp_vec / jnp.maximum(samp_dist[:, None], 1e-12)
        # Directional: perturb within cone (Common.hlsli:1303-1306)
        samp_dir_dir = _norm(l_dir + (t_d * dx[:, None] + b_d * dy[:, None]) * lt_radius[:, None])

        samp_dir = jnp.where(is_dir[:, None], samp_dir_dir, samp_dir_point)
        samp_max = jnp.where(is_dir, F32(10000.0), samp_dist)
        # Hard lanes trace the center direction on iteration 0 only.
        iter_hard = hard_active & (s == 0)
        trace_dir = jnp.where(soft[:, None], samp_dir, hard_dir)
        trace_max = jnp.where(soft, samp_max, hard_dist)
        above = _dot(samp_dir, normal) > 0.0
        do_trace = (iter_soft & above) | iter_hard
        sv, sc, so = intersect.trace_shadow(scene, origin, trace_dir, trace_max)
        rays = rays + do_trace.astype(jnp.int32)

        # hard result capture
        vis_h = jnp.where(iter_hard, sv, vis_h)
        color_h = jnp.where(iter_hard[:, None], sc, color_h)
        occ_h = jnp.where(iter_hard & (sv < 0.99), so, occ_h)

        # soft accumulation
        acc = iter_soft & above
        vis_sum = jnp.where(acc, vis_sum + sv, vis_sum)
        color_sum = jnp.where(acc[:, None], color_sum + sc * sv[:, None], color_sum)
        valid_samples = valid_samples + acc.astype(jnp.int32)
        occ_now = acc & (sv < 0.99)
        occluded = occluded + occ_now.astype(jnp.int32)
        min_occ = jnp.where(occ_now, jnp.minimum(min_occ, so), min_occ)
        pen = jnp.where(
            is_dir,
            sigma_pack_penumbra_directional(so, tan_ang),
            sigma_pack_penumbra_local(so, light_dist_center, light_size),
        )
        pen_sum = jnp.where(occ_now, pen_sum + pen, pen_sum)

    vis_soft = jnp.where(valid_samples > 0, vis_sum / jnp.maximum(valid_samples, 1), 1.0)
    occ_soft = jnp.where(occluded > 0, min_occ, jnp.float32(C.NRD_FP16_MAX))
    pen_soft = jnp.where(occluded > 0, pen_sum / jnp.maximum(occluded, 1), 0.0)
    color_soft = jnp.where(
        (vis_sum > 0.01)[:, None], color_sum / jnp.maximum(vis_sum, 1e-12)[:, None], 0.0
    )

    visibility = jnp.where(soft, vis_soft, vis_h)
    occluder = jnp.where(soft, occ_soft, occ_h)
    penumbra = jnp.where(soft, pen_soft, 0.0)
    shadow_color = jnp.where(soft[:, None], color_soft, color_h)

    # Ambient lights never shadow (Common.hlsli:1340-1348); inactive lanes lit.
    lit = is_ambient | ~active
    visibility = jnp.where(lit, 1.0, visibility)
    occluder = jnp.where(lit, jnp.float32(C.NRD_FP16_MAX), occluder)
    penumbra = jnp.where(lit, 0.0, penumbra)
    shadow_color = jnp.where(lit[:, None], 1.0, shadow_color)
    return seed, ShadowResult(visibility, penumbra, occluder, shadow_color, rays)


def estimate_light_contribution(scene, hit_pos, normal, li):
    """EstimateLightContribution (Common.hlsli:982-1004) for light index li."""
    lt = scene.lt_type[li]
    lpos = scene.lt_position[li]
    is_dir = lt == C.LIGHT_TYPE_DIRECTIONAL
    to_light = lpos[None, :] - hit_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    l_point = to_light / jnp.maximum(dist[:, None], 0.001)
    l_dir = _norm(-lpos)[None, :]
    l = jnp.where(is_dir, l_dir, l_point)
    atten = jnp.where(
        is_dir,
        1.0,
        compute_attenuation(dist, scene.atten_const, scene.atten_linear, scene.atten_quadratic),
    )
    ndotl = jnp.maximum(_dot(normal, l), 0.0)
    lum = luminance(scene.lt_color[li][:3])
    return ndotl * atten * scene.lt_intensity[li] * lum


def select_dominant_lights(scene, hit_pos, normal):
    """SelectDominantLights (Common.hlsli:1008-1047), vectorized over lanes.

    Returns (top0_idx, top0_c, top1_idx, top1_c, top_count) each [N].
    """
    n = hit_pos.shape[0]
    l_cap = scene.lt_type.shape[0]
    max_shadow = jnp.minimum(scene.max_shadow_lights, 2)
    max_shadow = jnp.where(max_shadow == 0, 2, max_shadow)

    top0_i = jnp.zeros((n,), jnp.int32)
    top0_c = jnp.full((n,), -1.0, F32)
    top1_i = jnp.zeros((n,), jnp.int32)
    top1_c = jnp.full((n,), -1.0, F32)
    count = jnp.zeros((n,), jnp.int32)

    for li in range(min(l_cap, 8)):
        in_range = (li < scene.num_lights) & scene.lt_valid[li]
        skip = (scene.lt_type[li] == C.LIGHT_TYPE_AMBIENT) | ~in_range
        contrib = estimate_light_contribution(scene, hit_pos, normal, li)
        beats0 = ~skip & (contrib > top0_c)
        beats1 = ~skip & ~beats0 & (contrib > top1_c) & (max_shadow > 1)
        # shift on beats0
        top1_i = jnp.where(beats0, top0_i, jnp.where(beats1, li, top1_i))
        top1_c = jnp.where(beats0, top0_c, jnp.where(beats1, contrib, top1_c))
        top0_i = jnp.where(beats0, li, top0_i)
        top0_c = jnp.where(beats0, contrib, top0_c)
        inserted = beats0 | beats1
        count = jnp.where(inserted, jnp.minimum(count + 1, max_shadow), count)
    return top0_i, top0_c, top1_i, top1_c, count


def compute_shadow_samples(base_samples, top0_i, top0_c, top1_i, top1_c, li):
    """ComputeShadowSamples (Common.hlsli:1062-1079) per lane for light li."""
    base = jnp.clip(base_samples.astype(jnp.int32), 1, 16)
    is_primary = top0_i == li
    is_secondary = top1_i == li
    ratio = top1_c / jnp.maximum(top0_c, 0.001)
    reduced = jnp.maximum(1, (base.astype(F32) * ratio).astype(jnp.int32))
    secondary = jnp.minimum(reduced, base // 2 + 1)
    return jnp.where(is_primary, base, jnp.where(is_secondary, secondary, 1))
