"""Batched analytic primitive intersection.

Vectorized (rays x primitives) equivalents of the reference's DXR
intersection shader (src/Shader/Intersection.hlsl:17-198): analytic sphere
quadratic, infinite plane, and OBB slab tests, plus the closest-hit resolve
that DXR's traversal performs in hardware. Self-intersection rejection
matches AnyHit_SkipSelf (src/Shader/AnyHit_SkipSelf.hlsl:6-28), shadow
transmission accumulation matches AnyHit_Shadow
(src/Shader/AnyHit_Shadow.hlsl:10-57), and the same-object thickness query
matches AnyHit_Thickness (:91-108).

All functions take a FlatScene and ray SoA arrays of shape [N,3]/[N] and
return per-ray results; the primitive axis is reduced on-device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C

# Python scalars (not jnp constants): creating device arrays at import time
# would initialize the default backend before callers can pick one.
_BIG = 1e30
_INF = 1e20  # matches Intersection.hlsl:102
_EPS = 1e-6


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def intersect_spheres(origin, direction, tmin, tmax, centers, radii, valid):
    """Sphere quadratic (Intersection.hlsl:17-52).

    origin/direction: [N,3]; centers [S,3]; radii/valid [S].
    Returns t [N,S] (1e30 where miss).
    """
    oc = origin[:, None, :] - centers[None, :, :]  # [N,S,3]
    a = _dot(direction, direction)[:, None]  # [N,1]
    b = 2.0 * jnp.sum(oc * direction[:, None, :], axis=-1)  # [N,S]
    c = jnp.sum(oc * oc, axis=-1) - (radii * radii)[None, :]
    disc = b * b - 4.0 * a * c
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sqrt_d) / (2.0 * a)
    t2 = (-b + sqrt_d) / (2.0 * a)
    t = jnp.where(t1 < tmin[:, None], t2, t1)
    ok = (disc >= 0.0) & (t >= tmin[:, None]) & (t <= tmax[:, None]) & valid[None, :]
    return jnp.where(ok, t, _BIG)


def intersect_planes(origin, direction, tmin, tmax, positions, normals, valid):
    """Infinite plane (Intersection.hlsl:53-77). Returns t [N,P]."""
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    denom = jnp.sum(direction[:, None, :] * n[None, :, :], axis=-1)  # [N,P]
    p0 = positions[None, :, :] - origin[:, None, :]
    t = jnp.sum(p0 * n[None, :, :], axis=-1) / jnp.where(jnp.abs(denom) > 1e-4, denom, 1.0)
    ok = (jnp.abs(denom) > 1e-4) & (t >= tmin[:, None]) & (t <= tmax[:, None]) & valid[None, :]
    return jnp.where(ok, t, _BIG)


def intersect_boxes(origin, direction, tmin, tmax, centers, halves, axes, valid):
    """OBB slab method in local space (Intersection.hlsl:78-198).

    axes: [B,3,3] with rows = box local X/Y/Z axes in world space.
    Returns (t [N,B], entering [N,B]).
    """
    delta = origin[:, None, :] - centers[None, :, :]  # [N,B,3]
    # Project onto local axes: local[k] = dot(v, axes[k])
    lo = jnp.einsum("nbj,bkj->nbk", delta, axes)  # [N,B,3] local origin
    ld = jnp.einsum("nj,bkj->nbk", direction, axes)  # [N,B,3] local dir
    h = halves[None, :, :]  # [1,B,3]

    par = jnp.abs(ld) < _EPS
    par_miss = par & ((lo < -h) | (lo > h))
    inv = 1.0 / jnp.where(par, 1.0, ld)
    t0 = jnp.where(par, -_INF, (-h - lo) * inv)
    t1 = jnp.where(par, _INF, (h - lo) * inv)
    slab_min = jnp.minimum(t0, t1)
    slab_max = jnp.maximum(t0, t1)
    t_near = jnp.max(slab_min, axis=-1)
    t_far = jnp.min(slab_max, axis=-1)

    hit_any = (t_near <= t_far) & (t_far >= tmin[:, None]) & ~jnp.any(par_miss, axis=-1)
    entering = t_near >= tmin[:, None]
    t = jnp.where(entering, t_near, t_far)
    ok = hit_any & (t >= tmin[:, None]) & (t <= tmax[:, None]) & valid[None, :]
    return jnp.where(ok, t, _BIG), entering


class Hit(NamedTuple):
    hit: jnp.ndarray  # [N] bool
    t: jnp.ndarray  # [N]
    obj_type: jnp.ndarray  # [N] i32 (OBJECT_TYPE_*)
    obj_index: jnp.ndarray  # [N] i32 index within type
    mat_slot: jnp.ndarray  # [N] i32 index into the combined material table


def _apply_skip(t, obj_type, index_base, skip_type, skip_index):
    """AnyHit_SkipSelf: invalidate the (type,index) the payload asks to skip."""
    k = t.shape[1]
    idx = jnp.arange(k, dtype=jnp.int32)[None, :]
    skip = (skip_type[:, None] == obj_type) & (skip_index[:, None] == idx)
    return jnp.where(skip, _BIG, t)


def trace_closest(scene, origin, direction, tmin, tmax, skip_type=None, skip_index=None) -> Hit:
    """Closest-hit resolve over spheres ++ planes ++ boxes.

    Global primitive ordering matches the reference's procedural BLAS
    (AccelerationStructure.cpp:107-300), so mat_slot = global index.
    skip_type/skip_index implement RAYFLAG_SKIP_SELF when given.
    """
    n = origin.shape[0]
    if skip_type is None:
        skip_type = jnp.full((n,), C.OBJECT_TYPE_INVALID & 0x7FFFFFFF, jnp.int32)
        skip_index = jnp.zeros((n,), jnp.int32)

    ts = intersect_spheres(
        origin, direction, tmin, tmax, scene.sph_center, scene.sph_radius, scene.sph_valid
    )
    tp = intersect_planes(
        origin, direction, tmin, tmax, scene.pln_position, scene.pln_normal, scene.pln_valid
    )
    tb, _ = intersect_boxes(
        origin, direction, tmin, tmax, scene.box_center, scene.box_half, scene.box_axes,
        scene.box_valid,
    )
    ts = _apply_skip(ts, C.OBJECT_TYPE_SPHERE, 0, skip_type, skip_index)
    tp = _apply_skip(tp, C.OBJECT_TYPE_PLANE, 0, skip_type, skip_index)
    tb = _apply_skip(tb, C.OBJECT_TYPE_BOX, 0, skip_type, skip_index)

    s_cap = ts.shape[1]
    p_cap = tp.shape[1]
    b_cap = tb.shape[1]
    all_t = jnp.concatenate([ts, tp, tb], axis=1)  # [N, S+P+B]
    best = jnp.argmin(all_t, axis=1).astype(jnp.int32)
    t = jnp.take_along_axis(all_t, best[:, None], axis=1)[:, 0]
    hit = t < _BIG * 0.5

    is_plane = (best >= s_cap) & (best < s_cap + p_cap)
    is_box = best >= s_cap + p_cap
    obj_type = jnp.where(
        is_box,
        jnp.int32(C.OBJECT_TYPE_BOX),
        jnp.where(is_plane, jnp.int32(C.OBJECT_TYPE_PLANE), jnp.int32(C.OBJECT_TYPE_SPHERE)),
    )
    obj_index = jnp.where(
        is_box, best - s_cap - p_cap, jnp.where(is_plane, best - s_cap, best)
    ).astype(jnp.int32)
    return Hit(hit=hit, t=t, obj_type=obj_type, obj_index=obj_index, mat_slot=best)


def box_face_normal(hit_position, centers, halves, axes, index):
    """Box normal recomputed from the hit position (ClosestHit.hlsl:109-124).

    hit_position [N,3]; index [N] selects the box. Returns world normal [N,3].
    """
    c = centers[index]  # [N,3]
    h = jnp.maximum(halves[index], 1e-4)
    ax = axes[index]  # [N,3,3]
    axn = ax / jnp.maximum(jnp.linalg.norm(ax, axis=-1, keepdims=True), 1e-12)
    local = jnp.einsum("nj,nkj->nk", hit_position - c, axn)  # [N,3]
    scaled = jnp.abs(local / h)
    sign = jnp.where(local >= 0.0, 1.0, -1.0)
    x_wins = (scaled[:, 0] >= scaled[:, 1]) & (scaled[:, 0] >= scaled[:, 2])
    y_wins = ~x_wins & (scaled[:, 1] >= scaled[:, 2])
    ln = jnp.stack(
        [
            jnp.where(x_wins, sign[:, 0], 0.0),
            jnp.where(y_wins, sign[:, 1], 0.0),
            jnp.where(~x_wins & ~y_wins, sign[:, 2], 0.0),
        ],
        axis=-1,
    )
    world = jnp.einsum("nk,nkj->nj", ln, axn)
    return world / jnp.maximum(jnp.linalg.norm(world, axis=-1, keepdims=True), 1e-12)


def surface_normal(scene, hit: Hit, origin, direction):
    """Outward geometric normal at the hit (Intersection.hlsl + ClosestHit.hlsl)."""
    pos = origin + direction * hit.t[:, None]
    # Sphere: normalize(hit - center) (Intersection.hlsl:41-42)
    sc = scene.sph_center[hit.obj_index]
    n_sph = pos - sc
    n_sph = n_sph / jnp.maximum(jnp.linalg.norm(n_sph, axis=-1, keepdims=True), 1e-12)
    # Plane: normalized plane normal (Intersection.hlsl:59)
    pn = scene.pln_normal[hit.obj_index]
    n_pln = pn / jnp.maximum(jnp.linalg.norm(pn, axis=-1, keepdims=True), 1e-12)
    # Box: recomputed face normal (ClosestHit.hlsl:109-124)
    n_box = box_face_normal(pos, scene.box_center, scene.box_half, scene.box_axes, hit.obj_index)
    n = jnp.where(
        (hit.obj_type == C.OBJECT_TYPE_BOX)[:, None],
        n_box,
        jnp.where((hit.obj_type == C.OBJECT_TYPE_PLANE)[:, None], n_pln, n_sph),
    )
    return pos, n


def trace_shadow(scene, origin, direction, max_dist):
    """Shadow transmission along a segment (AnyHit_Shadow.hlsl:10-57).

    Any opaque (transmission < 0.01) primitive hit blocks fully; translucent
    hits multiply `transmission` into visibility and a Beer-Lambert tint
    exp(-sigmaA * SHADOW_ABSORPTION_THICKNESS * ShadowAbsorptionScale) into
    the shadow color. Each primitive contributes at most one intersection,
    like the reference's one-report-per-primitive intersection shader.

    Returns (visibility [N], shadow_color [N,3], occluder_distance [N]).
    """
    n = origin.shape[0]
    tmin = jnp.full((n,), C.RAY_TMIN, jnp.float32)
    ts = intersect_spheres(
        origin, direction, tmin, max_dist, scene.sph_center, scene.sph_radius, scene.sph_valid
    )
    tp = intersect_planes(
        origin, direction, tmin, max_dist, scene.pln_position, scene.pln_normal, scene.pln_valid
    )
    tb, _ = intersect_boxes(
        origin, direction, tmin, max_dist, scene.box_center, scene.box_half, scene.box_axes,
        scene.box_valid,
    )
    all_t = jnp.concatenate([ts, tp, tb], axis=1)  # [N,M]
    hit_mask = all_t < _BIG * 0.5

    transmission = scene.mat_transmission[None, :]  # [1,M]
    absorption = scene.mat_absorption[None, :, :]  # [1,M,3]
    opaque = hit_mask & (transmission < 0.01)
    blocked = jnp.any(opaque, axis=1)

    translucent = hit_mask & (transmission >= 0.01)
    vis = jnp.prod(jnp.where(translucent, transmission, 1.0), axis=1)
    beer = jnp.exp(
        -absorption
        * jnp.float32(C.SHADOW_ABSORPTION_THICKNESS)
        * scene.shadow_absorption_scale
    )
    has_absorb = jnp.any(absorption > 0.0, axis=-1)  # [1,M]
    beer = jnp.where(has_absorb[..., None], beer, 1.0)
    color = jnp.prod(jnp.where(translucent[..., None], beer, 1.0), axis=1)

    vis = jnp.where(blocked, 0.0, vis)
    color = jnp.where(blocked[:, None], 0.0, color)
    occluder = jnp.min(jnp.where(hit_mask, all_t, jnp.float32(C.NRD_FP16_MAX)), axis=1)
    occluder = jnp.where(jnp.any(hit_mask, axis=1), occluder, jnp.float32(C.NRD_FP16_MAX))
    return vis, color, occluder


def trace_thickness(scene, origin, direction, obj_type, obj_index):
    """Same-object thickness query (RayGen.hlsl:646-672, AnyHit_Thickness).

    Finds the nearest intersection with the *same* primitive along the
    refraction direction. Returns (hit [N] bool, t [N]).
    """
    n = origin.shape[0]
    tmin = jnp.full((n,), C.RAY_TMIN, jnp.float32)
    tmax = jnp.full((n,), C.NRD_FP16_MAX, jnp.float32)
    ts = intersect_spheres(
        origin, direction, tmin, tmax, scene.sph_center, scene.sph_radius, scene.sph_valid
    )
    tb, _ = intersect_boxes(
        origin, direction, tmin, tmax, scene.box_center, scene.box_half, scene.box_axes,
        scene.box_valid,
    )
    idx = jnp.clip(obj_index, 0, ts.shape[1] - 1)
    t_sph = jnp.take_along_axis(ts, idx[:, None], axis=1)[:, 0]
    idxb = jnp.clip(obj_index, 0, tb.shape[1] - 1)
    t_box = jnp.take_along_axis(tb, idxb[:, None], axis=1)[:, 0]
    t = jnp.where(obj_type == C.OBJECT_TYPE_BOX, t_box, t_sph)
    hit = (t < _BIG * 0.5) & (
        (obj_type == C.OBJECT_TYPE_SPHERE) | (obj_type == C.OBJECT_TYPE_BOX)
    )
    return hit, jnp.where(hit, t, jnp.float32(C.NRD_FP16_MAX))
