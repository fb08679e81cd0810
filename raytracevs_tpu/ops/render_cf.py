"""Channel-first render pipeline (the TPU fast path).

The megakernel's native output is channel-first [NUM_CH, H, W] tile
planes; the classic pipeline interleaves them into [N,c] lane stacks
(`_accum_dict`/`_assemble_frame`) only for the denoiser to transpose them
straight back to [c,H,W] for its Pallas kernels. That round trip is pure
layout churn: measured ~23 ms at 4K (scripts/probe_4k_denoise_sub.py —
~15 ms of lane stacks + ~8 ms of cf transposes) against ~20 ms of actual
denoise kernel work.

This module re-states the G-buffer assembly (ops/render.py
`_assemble_frame`, itself RayGen.hlsl:850-1044) on channel PLANES:
3-vectors are [3,H,W] arrays, scalars are [H,W], every operation is
elementwise or an axis-0 concat (layout-preserving). Output feeds
post/denoise.denoise_frame_cf and post/composite.composite_cf without a
single transpose; the only interleave left in the whole frame is the
final uint8 RGBA pack.

Semantics are the lane pipeline's, op for op; the two differ in float
rounding only where the lane path uses matmul/reduction primitives
(motion-vector clip transform, normalizations) and XLA accumulates in a
different order. Equivalence: tests/test_cf_pipeline.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .. import constants as C
from ..scene.flatten import FlatScene, RenderConfig

F32 = jnp.float32


class GBufferCF(NamedTuple):
    """Channel-first NRD G-buffer (same fields/semantics as render.GBuffer,
    Common.hlsli:538-545; [c,H,W] planes instead of [N,c] lanes)."""

    diffuse_hitdist: jnp.ndarray  # [4,H,W]
    specular_hitdist: jnp.ndarray  # [4,H,W]
    normal_roughness: jnp.ndarray  # [4,H,W]
    view_z: jnp.ndarray  # [H,W]
    motion: jnp.ndarray  # [2,H,W]
    albedo: jnp.ndarray  # [4,H,W]
    shadow_data: jnp.ndarray  # [2,H,W]
    shadow_translucency: jnp.ndarray  # [4,H,W]
    obj_id: jnp.ndarray  # [H,W] i32
    # [2,H,W] specular VIRTUAL-motion vectors (REBLUR virtual-motion
    # reprojection); None where a path does not produce it
    motion_spec: jnp.ndarray = None


class FrameOutputCF(NamedTuple):
    color: jnp.ndarray  # [3,H,W] linear HDR
    gbuffer: GBufferCF
    rays: jnp.ndarray  # [] f32
    raw_specular: jnp.ndarray  # [3,H,W]


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _oct_encode_cf(n):
    """EncodeUnitVector (NRDEncoding.hlsli:73-79). n: [3,H,W] -> [2,H,W]."""
    s = jnp.sum(jnp.abs(n), axis=0)
    v = n / jnp.maximum(s, 1e-12)
    x, y = v[0], v[1]
    sx = jnp.where(x >= 0.0, 1.0, -1.0)
    sy = jnp.where(y >= 0.0, 1.0, -1.0)
    up = v[2] >= 0.0
    ox = jnp.where(up, x, (1.0 - jnp.abs(y)) * sx)
    oy = jnp.where(up, y, (1.0 - jnp.abs(x)) * sy)
    return jnp.stack([ox, oy], axis=0) * 0.5 + 0.5


def _norm3(v):
    """Normalize [3,H,W] along axis 0 (lane version: jnp.linalg.norm)."""
    m = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    return v / jnp.maximum(m, 1e-12)


def _const3(x, y, z):
    return jnp.array([x, y, z], F32)[:, None, None]


def assemble_frame_cf(scene, cfg, acc) -> FrameOutputCF:
    """Channel-first G-buffer assembly — the plane form of
    ops/render.py _assemble_frame (RayGen.hlsl:850-1044). `acc` is the
    dict from megakernel.render_accum_pallas_cf (after caustics)."""
    inv = F32(1.0 / cfg.samples_per_pixel)
    final_color = acc["color"] * inv
    avg_bounce = acc["bounce"] * inv
    prim_hit = acc["prim_hit"]

    # Photon debug modes 1/2 (RayGen.hlsl:859-891)
    if cfg.photon_debug_mode == 2:
        ratio = jnp.clip(avg_bounce / F32(max(cfg.max_bounces, 1)), 0.0, 1.0)
        final_color = jnp.broadcast_to(ratio[None], final_color.shape)
    elif cfg.photon_debug_mode == 1:
        final_color = jnp.maximum((acc["color"] - acc["primary"]) * inv, 0.0)

    world_normal = jnp.where(prim_hit, acc["prim_normal"], _const3(0.0, 1.0, 0.0))
    out_rough = jnp.where(prim_hit, acc["prim_rough"], 1.0)
    out_albedo = jnp.where(prim_hit, acc["prim_albedo"], 1.0)

    # Material classification (RayGen.hlsl:913-963)
    spec_dom = jnp.maximum(acc["prim_transmission"], acc["prim_metallic"])
    blend = 1.0 - _smoothstep(0.3, 0.7, spec_dom)
    diffuse_mod = acc["diffuse"] * inv
    direct_spec = acc["specular"] * inv
    secondary = jnp.maximum(final_color - diffuse_mod - direct_spec, 0.0)
    safe_albedo = jnp.maximum(out_albedo, 0.04)

    demod = diffuse_mod / safe_albedo
    diffuse_nrd = jnp.where(
        prim_hit,
        jnp.where(spec_dom > 0.7, 0.0,
                  jnp.where(spec_dom > 0.3, demod * blend, demod)),
        final_color,
    )
    spec_mid = final_color + (direct_spec + secondary - final_color) * blend
    specular_nrd = jnp.where(
        prim_hit,
        jnp.where(spec_dom > 0.7, final_color,
                  jnp.where(spec_dom > 0.3, spec_mid, direct_spec + secondary)),
        0.0,
    )

    mean_hitdist = acc["hitdist"] * inv
    diffuse_hitdist = jnp.concatenate([diffuse_nrd, mean_hitdist[None]], axis=0)
    specular_hitdist = jnp.concatenate([specular_nrd, mean_hitdist[None]], axis=0)

    # NRD inputs (NRDEncoding.hlsli:302-376)
    wn0, wn1, wn2 = world_normal[0], world_normal[1], world_normal[2]
    r, u, f = scene.cam_right, scene.cam_up, scene.cam_forward
    view_n = jnp.stack([
        wn0 * r[0] + wn1 * r[1] + wn2 * r[2],
        wn0 * u[0] + wn1 * u[1] + wn2 * u[2],
        wn0 * f[0] + wn1 * f[1] + wn2 * f[2],
    ], axis=0)
    view_n = _norm3(view_n)
    prim_pos = acc["prim_pos"]
    rel = prim_pos - scene.cam_pos[:, None, None]
    view_z = jnp.where(
        prim_hit,
        jnp.maximum(rel[0] * f[0] + rel[1] * f[1] + rel[2] * f[2], C.VIEWZ_MIN),
        F32(C.VIEWZ_SKY),
    )
    normal_roughness = jnp.concatenate(
        [
            _oct_encode_cf(view_n),
            jnp.where(view_n[2] >= 0.0, 1.0, 0.0)[None],
            jnp.sqrt(jnp.clip(out_rough, 0.0, 1.0))[None],
        ],
        axis=0,
    )

    # Motion vectors via current/previous view-projection
    # (NRDEncoding.hlsli:352-369): clip = [pos,1] @ VP, per component
    def clip_xyw(vp):
        cx = (prim_pos[0] * vp[0, 0] + prim_pos[1] * vp[1, 0]
              + prim_pos[2] * vp[2, 0] + vp[3, 0])
        cy = (prim_pos[0] * vp[0, 1] + prim_pos[1] * vp[1, 1]
              + prim_pos[2] * vp[2, 1] + vp[3, 1])
        cw = (prim_pos[0] * vp[0, 3] + prim_pos[1] * vp[1, 3]
              + prim_pos[2] * vp[2, 3] + vp[3, 3])
        safe_w = jnp.where(jnp.abs(cw) < 1e-9, 1.0, cw)
        return cx / safe_w, cy / safe_w

    cx, cy = clip_xyw(scene.view_proj)
    px_, py_ = clip_xyw(scene.prev_view_proj)
    mvx = jnp.clip((cx - px_) * F32(cfg.width * 0.5),
                   -C.MV_CLAMP_PIXELS, C.MV_CLAMP_PIXELS)
    mvy = jnp.clip((cy - py_) * F32(cfg.height * 0.5),
                   -C.MV_CLAMP_PIXELS, C.MV_CLAMP_PIXELS)
    zero = jnp.zeros_like(mvx)
    mv = jnp.stack([jnp.where(prim_hit, mvx, zero),
                    jnp.where(prim_hit, mvy, zero)], axis=0)

    # Specular VIRTUAL-motion vectors (REBLUR virtual-motion
    # reprojection; see ops/render.py's motion_spec block for the full
    # rationale): reproject Xv = X + V*hitDist*(1-roughness) instead of
    # the surface point. Static camera => mv_spec == mv bit-for-bit.
    vlen = jnp.sqrt(jnp.maximum(
        rel[0] * rel[0] + rel[1] * rel[1] + rel[2] * rel[2], 1e-18))
    v_amount = jnp.clip(1.0 - out_rough, 0.0, 1.0)
    vd = jnp.maximum(mean_hitdist, 0.0) * v_amount / vlen
    xv = prim_pos + rel * vd[None]

    def clip_xyw_at(vp, p):
        cx = (p[0] * vp[0, 0] + p[1] * vp[1, 0] + p[2] * vp[2, 0] + vp[3, 0])
        cy = (p[0] * vp[0, 1] + p[1] * vp[1, 1] + p[2] * vp[2, 1] + vp[3, 1])
        cw = (p[0] * vp[0, 3] + p[1] * vp[1, 3] + p[2] * vp[2, 3] + vp[3, 3])
        safe_w = jnp.where(jnp.abs(cw) < 1e-9, 1.0, cw)
        return cx / safe_w, cy / safe_w

    cvx, cvy = clip_xyw_at(scene.view_proj, xv)
    pvx, pvy = clip_xyw_at(scene.prev_view_proj, xv)
    mvsx = jnp.clip((cvx - pvx) * F32(cfg.width * 0.5),
                    -C.MV_CLAMP_PIXELS, C.MV_CLAMP_PIXELS)
    mvsy = jnp.clip((cvy - pvy) * F32(cfg.height * 0.5),
                    -C.MV_CLAMP_PIXELS, C.MV_CLAMP_PIXELS)
    mv_spec = jnp.stack([jnp.where(prim_hit, mvsx, zero),
                         jnp.where(prim_hit, mvsy, zero)], axis=0)

    # Material alpha for Composite (RayGen.hlsl:987-1000)
    material_alpha = jnp.where(
        prim_hit,
        jnp.where(spec_dom > 0.5, 0.5, 0.75 + (1.0 - 0.75) * blend),
        0.0,
    )
    albedo_out = jnp.concatenate([out_albedo, material_alpha[None]], axis=0)

    # SIGMA shadow inputs from the RAW first sample (RayGen.hlsl:1002-1039)
    sigma_pen = jnp.where(
        acc["shadow_vis"] > C.SHADOW_FULLY_LIT_THRESHOLD,
        F32(C.NRD_FP16_MAX),
        jnp.clip(acc["shadow_pen"], C.SIGMA_PENUMBRA_MIN,
                 C.SIGMA_PENUMBRA_PRACTICAL_MAX),
    )
    vis_clean = jnp.clip(acc["shadow_vis"], 0.0, 1.0)
    vis_clean = jnp.where(jnp.isfinite(vis_clean), vis_clean, 1.0)
    sigma_pen = jnp.where(jnp.isfinite(sigma_pen), sigma_pen, C.NRD_FP16_MAX)
    shadow_data = jnp.stack([sigma_pen, vis_clean], axis=0)
    h, w = vis_clean.shape
    shadow_translucency = jnp.concatenate(
        [(acc["shadow_dist"] >= C.NRD_FP16_MAX).astype(F32)[None],
         jnp.zeros((3, h, w), F32)], axis=0)

    return FrameOutputCF(
        color=final_color,
        gbuffer=GBufferCF(
            diffuse_hitdist=diffuse_hitdist,
            specular_hitdist=specular_hitdist,
            normal_roughness=normal_roughness,
            view_z=view_z,
            motion=mv,
            albedo=albedo_out,
            shadow_data=shadow_data,
            shadow_translucency=shadow_translucency,
            obj_id=acc["obj_id"],
            motion_spec=mv_spec,
        ),
        rays=acc["rays"],
        raw_specular=specular_nrd,
    )


def _planes_to_lanes3(p):
    """[3,H,W] -> [N,3] (interleave; only paid on the caustics detour)."""
    return p.transpose(1, 2, 0).reshape(-1, 3)


def _lanes_to_planes3(a, h, w):
    return a.reshape(h, w, 3).transpose(2, 0, 1)


def _apply_caustics_cf(scene, cfg, row_start, num_rows, acc, interpret,
                       pmap=None):
    """Photon-caustics fold-in on channel-first accumulators: the gather
    kernel speaks lanes, so the detour converts the few planes it needs
    and converts the delta back (render.py _apply_caustics semantics)."""
    if cfg.num_photons <= 0:
        return acc
    from . import photon as photon_mod
    from .render import caustics_delta

    h, w = acc["prim_hit"].shape
    if pmap is None:
        pmap = photon_mod.emit_and_trace(scene, cfg.num_photons,
                                         backend="pallas", interpret=interpret)
    delta_l, mask_l = caustics_delta(
        scene, cfg, pmap, acc["prim_hit"].reshape(-1),
        _planes_to_lanes3(acc["prim_pos"]), _planes_to_lanes3(acc["prim_normal"]),
        acc["prim_metallic"].reshape(-1), acc["prim_transmission"].reshape(-1),
        num_rows=num_rows, backend="pallas", interpret=interpret,
    )
    delta = _lanes_to_planes3(delta_l, h, w)
    out = dict(acc)
    if cfg.photon_debug_mode == 0:
        out["color"] = acc["color"] + delta
        out["diffuse"] = acc["diffuse"] + delta
        return out
    mask = mask_l.reshape(h, w)
    dbg = delta * F32(cfg.photon_debug_scale)
    out["color"] = jnp.where(mask, acc["color"] - acc["primary"] + dbg, acc["color"])
    out["primary"] = jnp.where(mask, dbg, acc["primary"])
    out["diffuse"] = jnp.where(mask, dbg, acc["diffuse"])
    out["specular"] = jnp.where(mask, 0.0, acc["specular"])
    out["shadow_vis"] = jnp.where(mask, 1.0, acc["shadow_vis"])
    out["shadow_pen"] = jnp.where(mask, 0.0, acc["shadow_pen"])
    out["shadow_dist"] = jnp.where(mask, F32(C.NRD_FP16_MAX), acc["shadow_dist"])
    return out


def render_rows_cf(scene: FlatScene, cfg: RenderConfig, row_start, num_rows: int,
                   backend: str = "pallas", interpret: bool = False,
                   pmap=None) -> FrameOutputCF:
    """Channel-first render_rows: megakernel backends only (the jnp
    wavefront is lane-native; it keeps the classic path)."""
    if backend not in ("pallas", "pallas_hbm"):
        raise ValueError(f"render_rows_cf supports pallas backends, not {backend!r}")
    from .pallas import megakernel

    acc = megakernel.render_accum_pallas_cf(
        scene, cfg, row_start, num_rows, interpret,
        mesh_hbm=(backend == "pallas_hbm"))
    acc = _apply_caustics_cf(scene, cfg, row_start, num_rows, acc, interpret,
                             pmap=pmap)
    return assemble_frame_cf(scene, cfg, acc)


def lane_gbuffer_from_cf(g: GBufferCF):
    """GBufferCF -> the classic [N,c] lane GBuffer (engine aux surface:
    validate_frame, debug views, get APIs). Pays the interleave once."""
    from .render import GBuffer

    def ln(a):
        c = a.shape[0]
        return a.transpose(1, 2, 0).reshape(-1, c)

    return GBuffer(
        diffuse_hitdist=ln(g.diffuse_hitdist),
        specular_hitdist=ln(g.specular_hitdist),
        normal_roughness=ln(g.normal_roughness),
        view_z=g.view_z.reshape(-1),
        motion=ln(g.motion),
        albedo=ln(g.albedo),
        shadow_data=ln(g.shadow_data),
        shadow_translucency=ln(g.shadow_translucency),
        obj_id=g.obj_id.reshape(-1),
        motion_spec=None if g.motion_spec is None else ln(g.motion_spec),
    )
