"""Pallas TPU megakernel: the whole wavefront DFS per pixel tile, in VMEM.

This is the TPU-native replacement for the reference's single DispatchRays
(DXRPipeline.cpp:2919-2937 + RayGen.hlsl): one `pallas_call` whose grid
walks (TILE_H x TILE_W) pixel tiles. Each grid step runs the complete
per-pixel LIFO work-queue loop — primary ray, bounces, shadow rays,
glass/metal children — with every piece of ray state, the 8-deep WorkItem
stack, and all accumulators resident in VMEM. Compared to the jnp wavefront
(ops/wavefront.py, kept as the portable reference implementation):

- the stack costs no HBM traffic (it was the dominant cost: a full
  [N,8,15]-word rewrite per bounce),
- each tile's `while_loop` exits as soon as *its own* rays finish, so sky
  and diffuse tiles stop after a couple of bounces while glass tiles run
  deep — the TPU analog of GPU warp retirement,
- gathers are replaced by static loops over the (small) primitive,
  material and light tables with masked selects — brute force over
  primitives exactly like the reference's software fallback tracer
  (RayTraceCompute.hlsl:183-387).

Vectors are represented component-wise as tuples of (TILE_H, TILE_W) f32
arrays (SoA over the VPU's (8,128) lanes).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from ...scene.flatten import FlatScene, RenderConfig
from .. import sampling

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

# Debug: comma-separated feature kill-switches for compiler bisection
_DEBUG_DISABLE = frozenset(
    x for x in os.environ.get("RTVS_MK_DISABLE", "").split(",") if x
)

TILE_H = int(os.environ.get("RTVS_MK_TILE_H", "32"))
assert TILE_H % 16 == 0, "TILE_H must be a multiple of the 16-px blue-noise tile"
TILE_W = 128
# Depth-epoch scheduling: each DFS iteration traces only the lanes whose
# pending ray sits at the tile's minimum depth; deeper lanes stall, so every
# packet BVH walk sees one bounce generation. Measured on v5e (wine glass,
# 1080p): NO speedup (117 vs 113 ms) — same-generation interior rays are
# still incoherent after TIR on curved glass, and the extra iterations eat
# what little the unions shrink. Kept behind a flag as a documented
# falsified experiment; per-ray results are identical either way (RNG is
# depth-salted, accumulation additive — tests prove bit-equality).
EPOCH_SCHED = os.environ.get("RTVS_MK_EPOCH", "0") not in ("0", "")
# Persistent-spp scheduling: all samples share one DFS loop with per-lane
# sample restart (see _run_persistent_k) instead of an outer sample scan
# whose every sample pays the tile's slowest lane. MEASURED SLOWER on the
# canonical glass scene (v5e 1080p: spp12 b10 17.1 s vs 10.7 s scanned;
# spp4 b5 1.55 s vs 1.08 s, scripts/probe_r4_persist.py): per-lane sample
# drift de-phases the tile, and packet walks pay the UNION of lane
# positions — out-of-phase lanes (one on its primary, another deep in a
# glass subtree) explode the per-walk node union far more than the saved
# tail iterations recover. Same lesson as the epoch-scheduling and
# two-phase falsifications: sample-phase alignment IS the packet
# coherence on this workload. Kept opt-in (RTVS_MK_PERSIST=1) with
# interpret-mode equivalence coverage.
PERSIST_SPP = os.environ.get("RTVS_MK_PERSIST", "0") == "1"
# Traversal-stats mode: "nodes" / "leaves" makes the mesh walks count BVH
# node visits (resp. leaf visits) and report them through the rays channel
# (scaled by the 4096-lane tile, so analysis divides by TILE_H*TILE_W).
# Perf analysis only — the rays metric is wrong while this is set.
_STATS = os.environ.get("RTVS_MK_STATS", "")
# Shadow walks start with analytically-blocked lanes already in the
# end-search state (AcceptHitAndEndSearch parity; see shadow_trace_k).
# RTVS_MK_SHADOW_SEED=0 reverts to unseeded walks for perf A/B.
_SHADOW_SEED = os.environ.get("RTVS_MK_SHADOW_SEED", "1") == "1"
# Count-based shadow walk (mesh_shadow_count_k) for <=8-instance meshes;
# RTVS_MK_SHADOW_COUNT=0 reverts to the multiply-per-crossing walk.
_SHADOW_COUNT = os.environ.get("RTVS_MK_SHADOW_COUNT", "1") == "1"
# RTVS_MK_SHADOW_FUSE=1 opts into the fused dual-ray dominant-light walk
# (mesh_shadow2_count_k). FALSIFIED as a default on the canonical scene
# (153.6 vs 142.5 ms, probe_r4_fuse): the two lights' shadow rays overlap
# too little in the BVH, so union steering makes shared visits run BOTH
# rays' triangle/box tests — leaf-op doubling outweighs the shared node
# loads. Kept opt-in (bit-identical, tests/test_shadow_fuse.py) for
# scenes whose dominant lights are nearly co-located.
_SHADOW_FUSE = os.environ.get("RTVS_MK_SHADOW_FUSE", "0") == "1"
# Interleaved shadow walks (mesh_shadow_ilv_count_k): independent walks
# advance in one while loop with SEPARATE node pointers — no union
# steering, outputs bit-identical to sequential by construction; the
# independent node-row loads pipeline each other's latency.
# RTVS_MK_SHADOW_ILV: 0 = sequential walks, 1 = interleave the two
# dominant lights per sample (pairwise), 2 = one walk group across ALL
# samples x both lights (default).
_SHADOW_ILV_MODE = int(os.environ.get("RTVS_MK_SHADOW_ILV", "2") or 0)
_SHADOW_ILV = _SHADOW_ILV_MODE >= 1
# Root-AABB walk preculling: a per-lane segment-vs-root-box slab test
# OUTSIDE each mesh walk lets the whole tile SKIP the walk (scalar
# lax.cond) when no lane's segment can touch the mesh. Exact by
# construction — a lane whose segment misses the root box can hit no node
# nested inside it, so its walk outputs are the miss values either way.
# This attacks walk-ENTRY cost, the measured bound on the canonical
# scene's shadow component (CLAUDE.md round-4 session-3: fat-leaf and
# leaf64 falsifications closed the node-descent theory). The reference's
# driver does the identical top-level skip inside TraceRay (the TLAS root
# test rejects before any BLAS is visited). RTVS_MK_PRECULL=0 for A/B.
_PRECULL = os.environ.get("RTVS_MK_PRECULL", "1") == "1"
_INVALID = 0x7FFFFFF
STACK_DEPTH = C.WORK_QUEUE_STRIDE

# Output channel map (matches SampleAccum + frame accumulators)
CH_COLOR = 0  # 3
CH_PRIMARY = 3  # 3
CH_DIFFUSE = 6  # 3
CH_SPECULAR = 9  # 3
CH_HITDIST = 12
CH_BOUNCE = 13
CH_RAYS = 14
CH_PRIM_HIT = 15
CH_NORMAL = 16  # 3
CH_ROUGH = 19
CH_ALBEDO = 20  # 3
CH_METALLIC = 23
CH_TRANSMISSION = 24
CH_POS = 25  # 3
CH_SHADOW_VIS = 28
CH_SHADOW_PEN = 29
CH_SHADOW_DIST = 30
CH_OBJ_ID = 31  # packed type*65536+index as f32 (exact below 2**24); -1 = sky
NUM_CH = 32
# Phase-A extra channels (two-phase renderer): the spawned continuation
# after one machine iteration — the coherence-sort key source.
CH_SPAWN_VALID = 32
CH_SPAWN_O = 33  # 3
CH_SPAWN_D = 36  # 3
NUM_CH_A = 39
# Phase-B output channels (sorted-lane order)
CHB_COLOR = 0  # 3
CHB_RAYS = 3
CHB_BOUNCE = 4
NUM_CH_B = 5


# ---------------------------------------------------------------------------
# vec3 helpers over component tuples
# ---------------------------------------------------------------------------
def v3(x, y, z):
    return (x, y, z)

def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)

def vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])

def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )

def vlen(a):
    return jnp.sqrt(jnp.maximum(vdot(a, a), 0.0))

def vnorm(a, eps=1e-24):
    inv = jax.lax.rsqrt(jnp.maximum(vdot(a, a), eps))
    return vscale(a, inv)

def vwhere(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]), jnp.where(m, a[2], b[2]))

def vconst(shape, x, y, z):
    return (jnp.full(shape, x, F32), jnp.full(shape, y, F32), jnp.full(shape, z, F32))

def vzeros(shape):
    return vconst(shape, 0.0, 0.0, 0.0)

def vbroadcast(shape, sx, sy, sz):
    return (
        jnp.broadcast_to(sx, shape).astype(F32),
        jnp.broadcast_to(sy, shape).astype(F32),
        jnp.broadcast_to(sz, shape).astype(F32),
    )

def vmax3(a):
    return jnp.maximum(a[0], jnp.maximum(a[1], a[2]))

def vfinite(a):
    return jnp.isfinite(a[0]) & jnp.isfinite(a[1]) & jnp.isfinite(a[2])

def vlerp(a, b, t):
    return (a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t, a[2] + (b[2] - a[2]) * t)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def reflect3(i, n):
    d = vdot(i, n)
    return vsub(i, vscale(n, 2.0 * d))


def sky_color3(d):
    """GetSkyColor (Common.hlsli:699-755), component-wise."""
    dn = vnorm(d)
    elevation = dn[1]
    t = jnp.clip(elevation, 0.0, 1.0)
    t_below = jnp.clip(-elevation, 0.0, 1.0)
    shape = elevation.shape
    zenith = vconst(shape, 0.15, 0.35, 0.75)
    sky_mid = vconst(shape, 0.35, 0.55, 0.90)
    horizon = vconst(shape, 0.70, 0.80, 0.95)
    glow = vconst(shape, 0.95, 0.85, 0.70)
    ground = vconst(shape, 0.25, 0.28, 0.35)

    horizon_fade = _smoothstep(0.0, 0.15, t)
    zenith_fade = _smoothstep(0.4, 1.0, t)
    glow_i = (1.0 - _smoothstep(0.0, 0.08, t)) * 0.4
    above = horizon
    above = vlerp(above, glow, glow_i)
    above = vlerp(above, sky_mid, horizon_fade)
    above = vlerp(above, zenith, zenith_fade)
    haze = jnp.exp(-t * 8.0) * 0.3
    above = vlerp(above, horizon, haze)

    ground_fade = _smoothstep(0.0, 0.3, t_below)
    below = vlerp(horizon, ground, ground_fade)
    dim = 0.8 + (0.4 - 0.8) * ground_fade
    below = vscale(below, dim)
    return vwhere(elevation >= 0.0, above, below)


# ---------------------------------------------------------------------------
# RNG (uint32) on tiles
# ---------------------------------------------------------------------------
def pcg_hash_t(v):
    v = v.astype(U32) * U32(747796405) + U32(2891336453)
    word = ((v >> ((v >> U32(28)) + U32(4))) ^ v) * U32(277803737)
    return (word >> U32(22)) ^ word


def rng_init_t(px, py, frame, sample, salt):
    s = (
        px.astype(U32) * U32(1973)
        + py.astype(U32) * U32(9277)
        + frame.astype(U32) * U32(26699)
        + sample.astype(U32) * U32(31837)
        + U32(salt) * U32(911)
    )
    return pcg_hash_t(s)


def _u24_to_f32(bits):
    """uint32 (< 2^24) -> float32; Mosaic lacks a direct u32->f32 cast, so
    reinterpret as i32 first (values are positive)."""
    return pltpu.bitcast(bits, jnp.int32).astype(F32)


def rng_next_t(state):
    state = pcg_hash_t(state)
    return state, _u24_to_f32(state >> U32(8)) * F32(1.0 / 16777216.0)


def masked_rng_next_t(state, active):
    new = pcg_hash_t(state)
    val = _u24_to_f32(new >> U32(8)) * F32(1.0 / 16777216.0)
    return jnp.where(active, new, state), val


def ortho_basis(d):
    """BuildOrthonormalBasis (Common.hlsli:1094-1099)."""
    use_y = jnp.abs(d[1]) < 0.999
    up = vwhere(use_y, vconst(d[0].shape, 0.0, 1.0, 0.0), vconst(d[0].shape, 1.0, 0.0, 0.0))
    tangent = vnorm(vcross(up, d))
    bitangent = vcross(d, tangent)
    return tangent, bitangent


def perturb_reflection_t(refl, n, roughness, state):
    """PerturbReflection (Common.hlsli:804-830)."""
    state, r1 = rng_next_t(state)
    state, r2 = rng_next_t(state)
    use_y = jnp.abs(n[0]) > 0.9
    t0 = vwhere(use_y, vconst(n[0].shape, 0.0, 1.0, 0.0), vconst(n[0].shape, 1.0, 0.0, 0.0))
    tangent = vnorm(vcross(n, t0))
    bitangent = vcross(n, tangent)
    angle = r1 * F32(6.28318)
    radius = roughness * roughness * r2
    off = vadd(vscale(tangent, jnp.cos(angle) * radius), vscale(bitangent, jnp.sin(angle) * radius))
    pert = vnorm(vadd(refl, off))
    below = vdot(pert, n) < 0.0
    pert = vwhere(below, reflect3(pert, n), pert)
    smooth = roughness < 0.01
    return state, vwhere(smooth, refl, pert)


class ScenePack(NamedTuple):
    """Host-packed scene tables for the kernel (all f32/i32 numpy->jnp)."""

    sph: jnp.ndarray  # [S,8]  cx cy cz radius valid 0 0 0
    pln: jnp.ndarray  # [P,8]  px py pz nx ny nz valid 0
    box: jnp.ndarray  # [B,16] c3 h3 ax3 ay3 az3 valid
    mat: jnp.ndarray  # [M,16] rgb metallic rough trans ior spec em3 ab3 pad
    lts: jnp.ndarray  # [L,12] type p3 rgb intensity radius samples valid pad
    fparams: jnp.ndarray  # [1,32] float params
    iparams: jnp.ndarray  # [1,8] int params
    bnoise: jnp.ndarray  # [16,128] blue noise: 4 channels side by side + pad


# float param slots
FP_CAMPOS = 0
FP_FWD = 3
FP_RIGHT = 6
FP_UP = 9
FP_TANFOV = 12
FP_APERTURE = 13
FP_FOCUS = 14
FP_SHADOW_STRENGTH = 15
FP_ABSORB_SCALE = 16
FP_ATTEN_C = 17
FP_ATTEN_L = 18
FP_ATTEN_Q = 19
# int param slots
IP_NUM_LIGHTS = 0
IP_MAX_SHADOW_LIGHTS = 1
IP_FRAME = 2
IP_ROW_START = 3


def pack_scene(scene: FlatScene, row_start=0) -> ScenePack:
    """Pack FlatScene device arrays into kernel tables (device-side, traced)."""
    s_cap = scene.sphere_capacity
    p_cap = scene.plane_capacity
    b_cap = scene.box_capacity
    l_cap = scene.light_capacity

    def pad_rows(a, cols):
        return jnp.zeros((max(a.shape[0], 1), cols), F32).at[: a.shape[0], : a.shape[1]].set(a)

    if s_cap:
        sph = jnp.concatenate(
            [scene.sph_center, scene.sph_radius[:, None], scene.sph_valid.astype(F32)[:, None]],
            axis=1,
        )
    else:
        sph = jnp.zeros((0, 5), F32)
    if p_cap:
        pln = jnp.concatenate(
            [scene.pln_position, scene.pln_normal, scene.pln_valid.astype(F32)[:, None]], axis=1
        )
    else:
        pln = jnp.zeros((0, 7), F32)
    if b_cap:
        box = jnp.concatenate(
            [
                scene.box_center,
                scene.box_half,
                scene.box_axes.reshape(b_cap, 9),
                scene.box_valid.astype(F32)[:, None],
            ],
            axis=1,
        )
    else:
        box = jnp.zeros((0, 16), F32)
    mat = jnp.concatenate(
        [
            scene.mat_color[:, :3],
            scene.mat_metallic[:, None],
            scene.mat_roughness[:, None],
            scene.mat_transmission[:, None],
            scene.mat_ior[:, None],
            scene.mat_specular[:, None],
            scene.mat_emission,
            scene.mat_absorption,
        ],
        axis=1,
    )
    if l_cap:
        lts = jnp.concatenate(
            [
                scene.lt_type.astype(F32)[:, None],
                scene.lt_position,
                scene.lt_color[:, :3],
                scene.lt_intensity[:, None],
                scene.lt_radius[:, None],
                scene.lt_samples[:, None],
                scene.lt_valid.astype(F32)[:, None],
            ],
            axis=1,
        )
    else:
        lts = jnp.zeros((0, 12), F32)

    fp = jnp.zeros((1, 32), F32)
    fp = fp.at[0, FP_CAMPOS : FP_CAMPOS + 3].set(scene.cam_pos)
    fp = fp.at[0, FP_FWD : FP_FWD + 3].set(scene.cam_forward)
    fp = fp.at[0, FP_RIGHT : FP_RIGHT + 3].set(scene.cam_right)
    fp = fp.at[0, FP_UP : FP_UP + 3].set(scene.cam_up)
    fp = fp.at[0, FP_TANFOV].set(scene.tan_half_fov)
    fp = fp.at[0, FP_APERTURE].set(scene.aperture_size)
    fp = fp.at[0, FP_FOCUS].set(scene.focus_distance)
    fp = fp.at[0, FP_SHADOW_STRENGTH].set(scene.shadow_strength)
    fp = fp.at[0, FP_ABSORB_SCALE].set(scene.shadow_absorption_scale)
    fp = fp.at[0, FP_ATTEN_C].set(scene.atten_const)
    fp = fp.at[0, FP_ATTEN_L].set(scene.atten_linear)
    fp = fp.at[0, FP_ATTEN_Q].set(scene.atten_quadratic)

    ip = jnp.zeros((1, 8), I32)
    ip = ip.at[0, IP_NUM_LIGHTS].set(scene.num_lights)
    ip = ip.at[0, IP_MAX_SHADOW_LIGHTS].set(scene.max_shadow_lights)
    ip = ip.at[0, IP_FRAME].set(scene.frame_index.astype(I32))
    ip = ip.at[0, IP_ROW_START].set(jnp.asarray(row_start, I32))

    # Blue noise packed as [16, 4*16 -> padded 128]
    bn = sampling.blue_noise_tile()  # [16,16,4]
    bn_flat = jnp.transpose(bn, (2, 0, 1)).reshape(4 * 16, 16)  # [64,16]
    bn_pad = jnp.zeros((64, 128), F32).at[:, :16].set(bn_flat)

    return ScenePack(
        sph=pad_rows(sph, 8),
        pln=pad_rows(pln, 8),
        box=pad_rows(box, 16),
        mat=pad_rows(mat, 16),
        lts=pad_rows(lts, 12),
        fparams=fp,
        iparams=ip,
        bnoise=bn_pad,
    )


# ---------------------------------------------------------------------------
# In-kernel scene access helpers (static loops over prim tables)
# ---------------------------------------------------------------------------
class KScene(NamedTuple):
    """Scene tables loaded as kernel-resident values plus static counts."""

    sph: object  # ref
    pln: object
    box: object
    mat: object
    lts: object
    s_cap: int
    p_cap: int
    b_cap: int
    l_cap: int
    atten_c: object
    atten_l: object
    atten_q: object
    num_lights: object
    max_shadow_lights: object
    shadow_strength: object
    absorb_scale: object
    cam_pos: tuple
    cam_fwd: tuple
    i_cap: int = 0  # mesh instance count (material rows after boxes)
    mesh: object = None  # KMesh when the scene has triangle geometry


def _atten(ks, dist):
    return 1.0 / jnp.maximum(ks.atten_c + ks.atten_l * dist + ks.atten_q * dist * dist, 1e-4)


def intersect_closest_k(ks: KScene, o, d, tmin, tmax, skip_type, skip_index,
                        thick_inst=None):
    """Closest hit + material + winner geometry, one static pass over prims.

    Returns dict of (TILE_H,TILE_W) arrays.
    """
    shape = o[0].shape
    best_t = jnp.full(shape, 1e30, F32)
    best_type = jnp.full(shape, _INVALID, I32)
    best_idx = jnp.zeros(shape, I32)
    best_slot = jnp.zeros(shape, I32)
    # winner geometry for deferred normal computation
    w_center = vzeros(shape)  # sphere/box center
    w_n = vconst(shape, 0.0, 1.0, 0.0)  # plane normal
    w_half = vzeros(shape)
    w_ax = vconst(shape, 1.0, 0.0, 0.0)
    w_ay = vconst(shape, 0.0, 1.0, 0.0)
    w_az = vconst(shape, 0.0, 0.0, 1.0)

    a = vdot(d, d)
    for i in range(ks.s_cap):
        cx, cy, cz = ks.sph[i, 0], ks.sph[i, 1], ks.sph[i, 2]
        radius, valid = ks.sph[i, 3], ks.sph[i, 4]
        oc = (o[0] - cx, o[1] - cy, o[2] - cz)
        b = 2.0 * vdot(oc, d)
        c = vdot(oc, oc) - radius * radius
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 < tmin, t2, t1)
        skip = (skip_type == C.OBJECT_TYPE_SPHERE) & (skip_index == i)
        ok = (disc >= 0.0) & (t >= tmin) & (t <= tmax) & (valid > 0.5) & ~skip
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, C.OBJECT_TYPE_SPHERE, best_type)
        best_idx = jnp.where(better, i, best_idx)
        best_slot = jnp.where(better, i, best_slot)
        w_center = vwhere(better, vbroadcast(shape, cx, cy, cz), w_center)

    for j in range(ks.p_cap):
        px_, py_, pz_ = ks.pln[j, 0], ks.pln[j, 1], ks.pln[j, 2]
        nx, ny, nz = ks.pln[j, 3], ks.pln[j, 4], ks.pln[j, 5]
        valid = ks.pln[j, 6]
        nl = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
        nx, ny, nz = nx / nl, ny / nl, nz / nl
        denom = d[0] * nx + d[1] * ny + d[2] * nz
        p0x, p0y, p0z = px_ - o[0], py_ - o[1], pz_ - o[2]
        t = (p0x * nx + p0y * ny + p0z * nz) / jnp.where(jnp.abs(denom) > 1e-4, denom, 1.0)
        skip = (skip_type == C.OBJECT_TYPE_PLANE) & (skip_index == j)
        ok = (jnp.abs(denom) > 1e-4) & (t >= tmin) & (t <= tmax) & (valid > 0.5) & ~skip
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, C.OBJECT_TYPE_PLANE, best_type)
        best_idx = jnp.where(better, j, best_idx)
        best_slot = jnp.where(better, ks.s_cap + j, best_slot)
        w_n = vwhere(better, vbroadcast(shape, nx, ny, nz), w_n)

    for k in range(ks.b_cap):
        bc = (ks.box[k, 0], ks.box[k, 1], ks.box[k, 2])
        bh = (ks.box[k, 3], ks.box[k, 4], ks.box[k, 5])
        bax = (ks.box[k, 6], ks.box[k, 7], ks.box[k, 8])
        bay = (ks.box[k, 9], ks.box[k, 10], ks.box[k, 11])
        baz = (ks.box[k, 12], ks.box[k, 13], ks.box[k, 14])
        valid = ks.box[k, 15]
        t, entering = _box_hit(o, d, tmin, bc, bh, bax, bay, baz)
        skip = (skip_type == C.OBJECT_TYPE_BOX) & (skip_index == k)
        ok = (t < 1e19) & (t >= tmin) & (t <= tmax) & (valid > 0.5) & ~skip
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, C.OBJECT_TYPE_BOX, best_type)
        best_idx = jnp.where(better, k, best_idx)
        best_slot = jnp.where(better, ks.s_cap + ks.p_cap + k, best_slot)
        w_center = vwhere(better, vbroadcast(shape, bc[0], bc[1], bc[2]), w_center)
        w_half = vwhere(better, vbroadcast(shape, bh[0], bh[1], bh[2]), w_half)
        w_ax = vwhere(better, vbroadcast(shape, bax[0], bax[1], bax[2]), w_ax)
        w_ay = vwhere(better, vbroadcast(shape, bay[0], bay[1], bay[2]), w_ay)
        w_az = vwhere(better, vbroadcast(shape, baz[0], baz[1], baz[2]), w_az)

    # Triangle meshes: packet BVH traversal, pruned by the analytic best_t
    is_mesh = jnp.zeros(shape, bool)
    mesh_nrm = vconst(shape, 0.0, 1.0, 0.0)
    mesh_front = jnp.zeros(shape, bool)
    visits = None
    thick_hit = thick_t = None
    if ks.mesh is not None and "mesh_closest" not in _DEBUG_DISABLE:
        km = ks.mesh
        track = thick_inst is not None
        count_stats = _STATS in ("nodes", "leaves")
        skip_m_i = (skip_type == C.OBJECT_TYPE_MESH).astype(I32)

        def run(_):
            # Analytic hits prune the packet walk: a lane occluded by a
            # plane or sphere stops dragging the tile through BVH nodes
            # behind it.
            mr = mesh_closest_k(km, o, d, tmin, jnp.minimum(best_t, tmax),
                                skip_m_i != 0, skip_index,
                                thick_inst=thick_inst)
            out = (mr["t"], mr["inst"], mr["smooth"][0], mr["smooth"][1],
                   mr["smooth"][2], mr["gdot"])
            if track:
                out = out + (mr["thick_t"], mr["thick_hit"].astype(I32))
            if count_stats:
                out = out + (mr["visits"],)
            return out

        if _PRECULL:
            zero = o[0] * 0.0
            izero = zero.astype(I32)
            bound = jnp.minimum(best_t, tmax)
            if track:
                # pending-thickness lanes walk with an OPEN t interval
                # (mesh_closest_k bound=big), so precull them against it
                bound = jnp.where(thick_inst >= 0, F32(1e30), bound)
            pre = _ray_aabb_k(o, _safe_inv(d), *_mesh_root_bb(km),
                              tmin, bound)

            def skipb(_):
                out = (zero + F32(1e30), izero - 1, zero, 1.0 + zero,
                       zero, zero)
                if track:
                    out = out + (zero + F32(1e30), izero)
                if count_stats:
                    out = out + (jnp.int32(0),)
                return out

            mout = jax.lax.cond(jnp.any(pre), run, skipb, 0)
        else:
            mout = run(0)
        mres = dict(t=mout[0], inst=mout[1],
                    smooth=(mout[2], mout[3], mout[4]), gdot=mout[5],
                    hit=mout[1] >= 0, visits=mout[-1] if count_stats else None)
        if track:
            thick_t, thick_hit = mout[6], mout[7] != 0
        better = mres["hit"] & (mres["t"] < best_t)
        best_t = jnp.where(better, mres["t"], best_t)
        best_type = jnp.where(better, C.OBJECT_TYPE_MESH, best_type)
        best_idx = jnp.where(better, mres["inst"], best_idx)
        best_slot = jnp.where(better, ks.s_cap + ks.p_cap + ks.b_cap + mres["inst"], best_slot)
        is_mesh = better
        # Geometric normal decides front/back; smooth normal shades
        # (ops/intersect.py surface_normal, ClosestHit_Triangle.hlsl:122-126)
        mesh_front = mres["gdot"] < 0.0
        mesh_nrm = vwhere(mesh_front, mres["smooth"], vscale(mres["smooth"], -1.0))
        visits = mres["visits"]

    hit = best_t < 1e29

    # Material via static loop over slots (M small)
    m_cap = ks.s_cap + ks.p_cap + ks.b_cap + ks.i_cap
    albedo = vzeros(shape)
    metallic = jnp.zeros(shape, F32)
    roughness = jnp.full(shape, 0.5, F32)
    transmission = jnp.zeros(shape, F32)
    ior = jnp.full(shape, 1.5, F32)
    specular = jnp.full(shape, 0.5, F32)
    emission = vzeros(shape)
    absorption = vzeros(shape)
    for m in range(m_cap):
        sel = best_slot == m
        albedo = vwhere(sel, vbroadcast(shape, ks.mat[m, 0], ks.mat[m, 1], ks.mat[m, 2]), albedo)
        metallic = jnp.where(sel, ks.mat[m, 3], metallic)
        roughness = jnp.where(sel, ks.mat[m, 4], roughness)
        transmission = jnp.where(sel, ks.mat[m, 5], transmission)
        ior = jnp.where(sel, ks.mat[m, 6], ior)
        specular = jnp.where(sel, ks.mat[m, 7], specular)
        emission = vwhere(
            sel, vbroadcast(shape, ks.mat[m, 8], ks.mat[m, 9], ks.mat[m, 10]), emission
        )
        absorption = vwhere(
            sel, vbroadcast(shape, ks.mat[m, 11], ks.mat[m, 12], ks.mat[m, 13]), absorption
        )

    # Hit position + outward normal
    pos = vadd(o, vscale(d, best_t))
    is_sph = best_type == C.OBJECT_TYPE_SPHERE
    is_pln = best_type == C.OBJECT_TYPE_PLANE
    is_box = best_type == C.OBJECT_TYPE_BOX
    n_sph = vnorm(vsub(pos, w_center))
    # Box face normal recomputed from hit position (ClosestHit.hlsl:109-124)
    axn = vnorm(w_ax)
    ayn = vnorm(w_ay)
    azn = vnorm(w_az)
    rel = vsub(pos, w_center)
    lx = vdot(rel, axn)
    ly = vdot(rel, ayn)
    lz = vdot(rel, azn)
    hx = jnp.maximum(w_half[0], 1e-4)
    hy = jnp.maximum(w_half[1], 1e-4)
    hz = jnp.maximum(w_half[2], 1e-4)
    sx, sy, sz = jnp.abs(lx / hx), jnp.abs(ly / hy), jnp.abs(lz / hz)
    sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)  # noqa: E731
    x_w = (sx >= sy) & (sx >= sz)
    y_w = ~x_w & (sy >= sz)
    z_w = ~x_w & ~y_w
    n_box = vnorm(
        vadd(
            vadd(
                vscale(axn, jnp.where(x_w, sgn(lx), 0.0)),
                vscale(ayn, jnp.where(y_w, sgn(ly), 0.0)),
            ),
            vscale(azn, jnp.where(z_w, sgn(lz), 0.0)),
        )
    )
    n_out = vwhere(is_box, n_box, vwhere(is_pln, w_n, n_sph))

    return {
        "hit": hit,
        "t": best_t,
        "type": best_type,
        "index": best_idx,
        "pos": pos,
        "n_out": n_out,
        "is_plane": is_pln,
        "is_mesh": is_mesh,
        "mesh_nrm": mesh_nrm,
        "mesh_front": mesh_front,
        "albedo": albedo,
        "metallic": metallic,
        "roughness": roughness,
        "transmission": transmission,
        "ior": ior,
        "specular": specular,
        "emission": emission,
        "absorption": absorption,
        "visits": visits,
        "thick_hit": thick_hit,
        "thick_t": thick_t,
    }


def _box_hit(o, d, tmin, bc, bh, bax, bay, baz):
    """OBB slab test (Intersection.hlsl:78-198); returns (t, entering)."""
    rel = (o[0] - bc[0], o[1] - bc[1], o[2] - bc[2])
    INF = F32(1e20)
    t_near = None
    t_far = None
    par_miss = None
    for axis, h in ((bax, bh[0]), (bay, bh[1]), (baz, bh[2])):
        lo = vdot(rel, axis)
        ld = vdot(d, axis)
        par = jnp.abs(ld) < 1e-6
        pm = par & ((lo < -h) | (lo > h))
        inv = 1.0 / jnp.where(par, 1.0, ld)
        t0 = jnp.where(par, -INF, (-h - lo) * inv)
        t1 = jnp.where(par, INF, (h - lo) * inv)
        smin = jnp.minimum(t0, t1)
        smax = jnp.maximum(t0, t1)
        t_near = smin if t_near is None else jnp.maximum(t_near, smin)
        t_far = smax if t_far is None else jnp.minimum(t_far, smax)
        par_miss = pm if par_miss is None else (par_miss | pm)
    hit_any = (t_near <= t_far) & (t_far >= tmin) & ~par_miss
    entering = t_near >= tmin
    t = jnp.where(entering, t_near, t_far)
    ok = hit_any & (t >= tmin)
    return jnp.where(ok, t, F32(1e30)), entering


def _shadow_analytic_k(ks: KScene, o, d, max_dist):
    """Analytic-prim part of AnyHit_Shadow: transmission product over the
    sphere/plane/box tables. Returns (vis, color, occ, blocked) with the
    opaque-blocked zeroing already applied (the mesh fold happens in the
    caller so single- and dual-ray traces can share this body)."""
    shape = o[0].shape
    tmin = F32(C.RAY_TMIN)
    vis = jnp.ones(shape, F32)
    color = vconst(shape, 1.0, 1.0, 1.0)
    blocked = jnp.zeros(shape, bool)
    occ = jnp.full(shape, C.NRD_FP16_MAX, F32)
    any_hit = jnp.zeros(shape, bool)

    a = vdot(d, d)

    def apply(hit_ok, t, m_slot):
        nonlocal vis, color, blocked, occ, any_hit
        trans = ks.mat[m_slot, 5]
        abx, aby, abz = ks.mat[m_slot, 11], ks.mat[m_slot, 12], ks.mat[m_slot, 13]
        opaque = hit_ok & (trans < 0.01)
        blocked = blocked | opaque
        translucent = hit_ok & (trans >= 0.01)
        vis = jnp.where(translucent, vis * trans, vis)
        scale = F32(C.SHADOW_ABSORPTION_THICKNESS) * ks.absorb_scale
        has_ab = (abx > 0.0) | (aby > 0.0) | (abz > 0.0)
        bx = jnp.where(has_ab, jnp.exp(-abx * scale), 1.0)
        by = jnp.where(has_ab, jnp.exp(-aby * scale), 1.0)
        bz = jnp.where(has_ab, jnp.exp(-abz * scale), 1.0)
        color = vwhere(translucent, (color[0] * bx, color[1] * by, color[2] * bz), color)
        occ = jnp.where(hit_ok, jnp.minimum(occ, t), occ)
        any_hit = any_hit | hit_ok

    for i in range(ks.s_cap):
        cx, cy, cz = ks.sph[i, 0], ks.sph[i, 1], ks.sph[i, 2]
        radius, valid = ks.sph[i, 3], ks.sph[i, 4]
        oc = (o[0] - cx, o[1] - cy, o[2] - cz)
        b = 2.0 * vdot(oc, d)
        c = vdot(oc, oc) - radius * radius
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 < tmin, t2, t1)
        ok = (disc >= 0.0) & (t >= tmin) & (t <= max_dist) & (valid > 0.5)
        apply(ok, t, i)
    for j in range(ks.p_cap):
        nx, ny, nz = ks.pln[j, 3], ks.pln[j, 4], ks.pln[j, 5]
        valid = ks.pln[j, 6]
        nl = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
        nx, ny, nz = nx / nl, ny / nl, nz / nl
        denom = d[0] * nx + d[1] * ny + d[2] * nz
        p0x = ks.pln[j, 0] - o[0]
        p0y = ks.pln[j, 1] - o[1]
        p0z = ks.pln[j, 2] - o[2]
        t = (p0x * nx + p0y * ny + p0z * nz) / jnp.where(jnp.abs(denom) > 1e-4, denom, 1.0)
        ok = (jnp.abs(denom) > 1e-4) & (t >= tmin) & (t <= max_dist) & (valid > 0.5)
        apply(ok, t, ks.s_cap + j)
    for k in range(ks.b_cap):
        bc = (ks.box[k, 0], ks.box[k, 1], ks.box[k, 2])
        bh = (ks.box[k, 3], ks.box[k, 4], ks.box[k, 5])
        bax = (ks.box[k, 6], ks.box[k, 7], ks.box[k, 8])
        bay = (ks.box[k, 9], ks.box[k, 10], ks.box[k, 11])
        baz = (ks.box[k, 12], ks.box[k, 13], ks.box[k, 14])
        valid = ks.box[k, 15]
        t, _ = _box_hit(o, d, jnp.full(shape, tmin, F32), bc, bh, bax, bay, baz)
        ok = (t < 1e19) & (t <= max_dist) & (valid > 0.5)
        apply(ok, t, ks.s_cap + ks.p_cap + k)

    vis = jnp.where(blocked, 0.0, vis)
    color = vwhere(blocked, vzeros(shape), color)
    occ = jnp.where(any_hit, occ, F32(C.NRD_FP16_MAX))
    return vis, color, occ, blocked


def shadow_trace_k(ks: KScene, o, d, max_dist):
    """Shadow transmission product over all prims (AnyHit_Shadow semantics)."""
    vis, color, occ, blocked = _shadow_analytic_k(ks, o, d, max_dist)
    if ks.mesh is not None and "mesh_shadow" not in _DEBUG_DISABLE:
        # Fold mesh transmission in (ops/intersect.py _merge_mesh_shadow).
        # Lanes already blocked by an opaque analytic hit seed the walk's
        # end-search mask (AcceptHitAndEndSearch, AnyHit_Shadow.hlsl:44-49:
        # an opaque commit ends the WHOLE search) — they stop steering the
        # packet, so fully-shadowed tiles skip the mesh BVH entirely.
        km = ks.mesh
        walk = (mesh_shadow_count_k
                if _SHADOW_COUNT and km.num_inst <= 8 else mesh_shadow_k)
        blk_i = blocked.astype(I32)  # i32: bool captures can't cross scf.if
        seed = blk_i if _SHADOW_SEED else None

        def run(_):
            mvis, mcol, mocc = walk(km, o, d, max_dist, blocked0=seed)
            return (mvis, mcol[0], mcol[1], mcol[2], mocc)

        if _PRECULL:
            pre = _ray_aabb_k(o, _safe_inv(d), *_mesh_root_bb(km),
                              F32(C.RAY_TMIN), max_dist)
            # Seeded walks also skip when every in-box lane is blocked
            # (their search already ended); unseeded walks keep blocked
            # lanes live, matching legacy occ accumulation bit-for-bit.
            need_l = (pre & (blk_i == 0)) if _SHADOW_SEED else pre
            zero = o[0] * 0.0
            one = 1.0 + zero

            def skip(_):
                return (one, one, one, one, zero + F32(C.NRD_FP16_MAX))

            mvis, mr, mg, mb, mocc = jax.lax.cond(
                jnp.any(need_l), run, skip, 0)
        else:
            mvis, mr, mg, mb, mocc = run(0)
        vis = vis * mvis
        color = vmul(color, (mr, mg, mb))
        occ = jnp.minimum(occ, mocc)
    return vis, color, occ


def shadow_trace2_k(ks: KScene, o, dA, maxA, dB, maxB):
    """Two same-origin shadow traces (the per-iteration dominant-light
    pair) resolved with ONE fused mesh packet walk.

    The analytic prim tests stay per-ray (cheap static loops); the mesh
    BVH — whose node DESCENT dominates shadow cost (count-walk probe:
    a 25% leaf-op cut moved the frame only ~8%) — is walked once, steered
    by the union of both rays. Per-ray results are bit-identical to two
    sequential count walks: crossing counts / occ-min are traversal-order
    independent, and genuine crossings arrive in the same threaded node
    order, so opaque end-search (AnyHit_Shadow.hlsl:44-49) blocks each
    lane at the same crossing either way."""
    visA, colA, occA, blkA = _shadow_analytic_k(ks, o, dA, maxA)
    visB, colB, occB, blkB = _shadow_analytic_k(ks, o, dB, maxB)
    if ks.mesh is not None and "mesh_shadow" not in _DEBUG_DISABLE:
        km = ks.mesh
        blkA_i = blkA.astype(I32)  # i32: bool captures can't cross scf.if
        blkB_i = blkB.astype(I32)
        seedA = blkA_i if _SHADOW_SEED else None
        seedB = blkB_i if _SHADOW_SEED else None

        def run(_):
            if _SHADOW_FUSE and _SHADOW_COUNT and km.num_inst <= 8:
                (mvA, mcA, moA), (mvB, mcB, moB) = mesh_shadow2_count_k(
                    km, o, dA, maxA, dB, maxB,
                    blockedA0=seedA, blockedB0=seedB)
            elif _SHADOW_ILV and _SHADOW_COUNT and km.num_inst <= 8:
                (mvA, mcA, moA), (mvB, mcB, moB) = mesh_shadow_ilv_count_k(
                    km, o, [(dA, maxA, seedA), (dB, maxB, seedB)])
            else:
                walk = (mesh_shadow_count_k
                        if _SHADOW_COUNT and km.num_inst <= 8
                        else mesh_shadow_k)
                mvA, mcA, moA = walk(km, o, dA, maxA, blocked0=seedA)
                mvB, mcB, moB = walk(km, o, dB, maxB, blocked0=seedB)
            return (mvA, mcA[0], mcA[1], mcA[2], moA,
                    mvB, mcB[0], mcB[1], mcB[2], moB)

        if _PRECULL:
            lo, hi = _mesh_root_bb(km)
            tmin = F32(C.RAY_TMIN)
            preA = _ray_aabb_k(o, _safe_inv(dA), lo, hi, tmin, maxA)
            preB = _ray_aabb_k(o, _safe_inv(dB), lo, hi, tmin, maxB)
            if _SHADOW_SEED:
                need_l = (preA & (blkA_i == 0)) | (preB & (blkB_i == 0))
            else:
                need_l = preA | preB
            zero = o[0] * 0.0
            one = 1.0 + zero
            inf = zero + F32(C.NRD_FP16_MAX)

            def skip(_):
                return (one, one, one, one, inf, one, one, one, one, inf)

            out = jax.lax.cond(jnp.any(need_l), run, skip, 0)
        else:
            out = run(0)
        (mvA, mrA, mgA, mbA, moA, mvB, mrB, mgB, mbB, moB) = out
        visA = visA * mvA
        colA = vmul(colA, (mrA, mgA, mbA))
        occA = jnp.minimum(occA, moA)
        visB = visB * mvB
        colB = vmul(colB, (mrB, mgB, mbB))
        occB = jnp.minimum(occB, moB)
    return (visA, colA, occA), (visB, colB, occB)


def thickness_trace_k(ks: KScene, o, d, obj_type, obj_index, include_mesh=True):
    """Same-object thickness query (AnyHit_Thickness semantics).

    include_mesh=False compiles out the mesh walk — callers that defer
    mesh-glass thickness to the refract child's fused closest walk
    (mesh_closest_k thick_inst) pass their mesh lanes as _INVALID here."""
    shape = o[0].shape
    tmin = F32(C.RAY_TMIN)
    t_out = jnp.full(shape, 1e30, F32)
    a = vdot(d, d)
    for i in range(ks.s_cap):
        sel = (obj_type == C.OBJECT_TYPE_SPHERE) & (obj_index == i)
        cx, cy, cz = ks.sph[i, 0], ks.sph[i, 1], ks.sph[i, 2]
        radius = ks.sph[i, 3]
        oc = (o[0] - cx, o[1] - cy, o[2] - cz)
        b = 2.0 * vdot(oc, d)
        c = vdot(oc, oc) - radius * radius
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 < tmin, t2, t1)
        ok = sel & (disc >= 0.0) & (t >= tmin)
        t_out = jnp.where(ok, t, t_out)
    for k in range(ks.b_cap):
        sel = (obj_type == C.OBJECT_TYPE_BOX) & (obj_index == k)
        bc = (ks.box[k, 0], ks.box[k, 1], ks.box[k, 2])
        bh = (ks.box[k, 3], ks.box[k, 4], ks.box[k, 5])
        bax = (ks.box[k, 6], ks.box[k, 7], ks.box[k, 8])
        bay = (ks.box[k, 9], ks.box[k, 10], ks.box[k, 11])
        baz = (ks.box[k, 12], ks.box[k, 13], ks.box[k, 14])
        t, _ = _box_hit(o, d, jnp.full(shape, tmin, F32), bc, bh, bax, bay, baz)
        ok = sel & (t < 1e19)
        t_out = jnp.where(ok, t, t_out)
    hit = t_out < 1e29
    t_fin = jnp.where(hit, t_out, F32(C.NRD_FP16_MAX))
    if include_mesh and ks.mesh is not None and "mesh_thick" not in _DEBUG_DISABLE:
        mh, mt = mesh_thickness_k(ks.mesh, o, d, obj_index,
                                  active=obj_type == C.OBJECT_TYPE_MESH)
        sel_m = obj_type == C.OBJECT_TYPE_MESH
        # logical merge, not jnp.where: Mosaic cannot lower select with i1
        # value operands (extends to i8, then fails the i8->i1 trunc)
        hit = (sel_m & mh) | (~sel_m & hit)
        t_fin = jnp.where(sel_m, mt, t_fin)
    return hit, t_fin


# ---------------------------------------------------------------------------
# In-kernel shading (component-style ports of ops/shade.py)
# ---------------------------------------------------------------------------
def _luminance(r, g, b):
    return r * 0.2126 + g * 0.7152 + b * 0.0722


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * _pow5(1.0 - cos_theta)


def _fresnel3(vdoth, f0):
    p = _pow5(jnp.clip(1.0 - vdoth, 0.0, 1.0))
    return (f0[0] + (1.0 - f0[0]) * p, f0[1] + (1.0 - f0[1]) * p, f0[2] + (1.0 - f0[2]) * p)


def _ggx_d(ndoth, roughness):
    a2 = jnp.square(roughness * roughness)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (F32(C.PI) * denom * denom + 1e-4)


def _smith_g(ndotv, ndotl, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    g1 = lambda x: x / (x * (1.0 - k) + k)  # noqa: E731
    return g1(ndotv) * g1(ndotl)


def _checker_albedo(pos, cam_pos, cam_fwd):
    """Plane checkerboard with distance fade (ClosestHit.hlsl:77-95)."""
    u, v = pos[0], pos[2]
    view_z = jnp.maximum(vdot(vsub(pos, cam_pos), cam_fwd), 0.0)
    fade = jnp.exp(-view_z / F32(C.CHECKER_FADE_DISTANCE))
    contrast = 0.3 + 0.7 * fade
    ix = jnp.floor(u).astype(I32)
    iy = jnp.floor(v).astype(I32)
    checker = ((ix + iy) & 1).astype(F32)
    value = 0.5 + (checker - 0.5) * contrast
    g = 0.1 + 0.8 * value
    return (g, g, g)


def _light_fields(ks, li):
    lt = ks.lts[li, 0].astype(I32)
    lp = (ks.lts[li, 1], ks.lts[li, 2], ks.lts[li, 3])
    lc = (ks.lts[li, 4], ks.lts[li, 5], ks.lts[li, 6])
    lint = ks.lts[li, 7]
    lrad = ks.lts[li, 8]
    lsamp = ks.lts[li, 9]
    lval = ks.lts[li, 10] > 0.5
    return lt, lp, lc, lint, lrad, lsamp, lval


def _light_geom_k(ks, lt, lp, pos, nrm):
    shape = pos[0].shape
    is_dir = lt == C.LIGHT_TYPE_DIRECTIONAL
    to_l = vsub(vbroadcast(shape, lp[0], lp[1], lp[2]), pos)
    dist = vlen(to_l)
    ln = jnp.sqrt(jnp.maximum(lp[0] ** 2 + lp[1] ** 2 + lp[2] ** 2, 1e-24))
    ldir = vbroadcast(shape, -lp[0] / ln, -lp[1] / ln, -lp[2] / ln)
    l_vec = vwhere(is_dir, ldir, vscale(to_l, 1.0 / jnp.maximum(dist, 1e-12)))
    atten = jnp.where(is_dir, 1.0, _atten(ks, dist))
    ndotl = jnp.maximum(vdot(nrm, l_vec), 0.0)
    return is_dir, l_vec, atten, ndotl, dist


def _sigma_pack_local(d_occ, d_light, light_size):
    size = light_size * d_occ / jnp.maximum(d_light - d_occ, F32(C.NRD_EPS))
    return jnp.where(
        d_occ >= C.NRD_FP16_MAX,
        F32(C.NRD_FP16_MAX),
        jnp.minimum(size * 0.5, F32(C.SIGMA_PENUMBRA_ABSOLUTE_MAX)),
    )


def _sigma_pack_dir(d_occ, tan_ang):
    return jnp.where(
        d_occ >= C.NRD_FP16_MAX,
        F32(C.NRD_FP16_MAX),
        jnp.minimum(d_occ * tan_ang * 0.5, F32(C.SIGMA_PENUMBRA_ABSOLUTE_MAX)),
    )


def _soft_shadow_setup(ks, cfg, pos, nrm, active, lt, lp, lrad, lsamp, seed):
    """Sample-direction generation half of CalculateSoftShadow
    (Common.hlsli:1199+): consumes the light's RNG draws in exactly the
    sequential order (all of this light's samples before the next light's)
    and returns per-sample trace inputs, so the traces themselves can be
    paired across the two dominant lights (shadow_trace2_k)."""
    is_dir = lt == C.LIGHT_TYPE_DIRECTIONAL
    is_ambient = lt == C.LIGHT_TYPE_AMBIENT
    soft = lrad > 0.001
    origin = vadd(pos, vscale(nrm, F32(C.SHADOW_NORMAL_OFFSET)))

    dir_point = vsub(lp, pos)
    dist_point = vlen(dir_point)
    l_point = vscale(dir_point, 1.0 / jnp.maximum(dist_point, 1e-12))
    l_dir = vnorm(vscale(lp, -1.0))
    hard_dir = vwhere(is_dir, l_dir, l_point)
    hard_dist = jnp.where(is_dir, F32(10000.0), dist_point)

    num_samples = jnp.clip(lsamp.astype(I32), 1, 16)
    light_size = lrad * 2.0
    tan_ang = jnp.tan(lrad)
    t_p, b_p = ortho_basis(vnorm(dir_point))
    t_d, b_d = ortho_basis(l_dir)

    shadowed = active & ~is_ambient
    soft_active = shadowed & soft
    hard_active = shadowed & ~soft
    samples = []
    for s in range(cfg.max_soft_samples):
        iter_soft = soft_active & (s < num_samples)
        seed, u1 = masked_rng_next_t(seed, iter_soft)
        seed, u2 = masked_rng_next_t(seed, iter_soft)
        r = jnp.sqrt(u1)
        theta = u2 * F32(6.28318530718)
        dx = r * jnp.cos(theta)
        dy = r * jnp.sin(theta)

        sample_pos = vadd(lp, vscale(vadd(vscale(t_p, dx), vscale(b_p, dy)), lrad))
        samp_vec = vsub(sample_pos, pos)
        samp_dist = vlen(samp_vec)
        samp_dir_p = vscale(samp_vec, 1.0 / jnp.maximum(samp_dist, 1e-12))
        samp_dir_d = vnorm(vadd(l_dir, vscale(vadd(vscale(t_d, dx), vscale(b_d, dy)), lrad)))
        samp_dir = vwhere(is_dir, samp_dir_d, samp_dir_p)
        samp_max = jnp.where(is_dir, F32(10000.0), samp_dist)

        iter_hard = hard_active & (s == 0)
        trace_dir = vwhere(soft, samp_dir, hard_dir)
        trace_max = jnp.where(soft, samp_max, hard_dist)
        above = vdot(samp_dir, nrm) > 0.0
        do_trace = (iter_soft & above) | iter_hard
        trace_max = jnp.where(do_trace, trace_max, 0.0)  # keep idle lanes out of the walk
        samples.append((trace_dir, trace_max, iter_soft & above, iter_hard))

    state = dict(origin=origin, soft=soft, is_dir=is_dir, is_ambient=is_ambient,
                 active=active, dist_point=dist_point, light_size=light_size,
                 tan_ang=tan_ang, samples=samples)
    return seed, state


def _soft_shadow_accum(state, traces):
    """Accumulation half of CalculateSoftShadow: folds the per-sample
    (vis, color, occ) trace results into the light's shadow outputs."""
    soft = state["soft"]
    is_dir = state["is_dir"]
    shape = soft.shape
    vis_sum = jnp.zeros(shape, F32)
    pen_sum = jnp.zeros(shape, F32)
    min_occ = jnp.full(shape, C.NRD_FP16_MAX, F32)
    occluded = jnp.zeros(shape, I32)
    valid_samples = jnp.zeros(shape, I32)
    color_sum = vzeros(shape)
    vis_h = jnp.ones(shape, F32)
    color_h = vconst(shape, 1.0, 1.0, 1.0)
    occ_h = jnp.full(shape, C.NRD_FP16_MAX, F32)
    rays = jnp.zeros(shape, I32)

    for (_, _, acc, iter_hard), (sv, sc, so) in zip(state["samples"], traces):
        rays = rays + (acc | iter_hard).astype(I32)

        vis_h = jnp.where(iter_hard, sv, vis_h)
        color_h = vwhere(iter_hard, sc, color_h)
        occ_h = jnp.where(iter_hard & (sv < 0.99), so, occ_h)

        vis_sum = jnp.where(acc, vis_sum + sv, vis_sum)
        color_sum = vwhere(acc, vadd(color_sum, vscale(sc, sv)), color_sum)
        valid_samples = valid_samples + acc.astype(I32)
        occ_now = acc & (sv < 0.99)
        occluded = occluded + occ_now.astype(I32)
        min_occ = jnp.where(occ_now, jnp.minimum(min_occ, so), min_occ)
        pen = jnp.where(
            is_dir, _sigma_pack_dir(so, state["tan_ang"]),
            _sigma_pack_local(so, state["dist_point"], state["light_size"])
        )
        pen_sum = jnp.where(occ_now, pen_sum + pen, pen_sum)

    inv_vs = 1.0 / jnp.maximum(valid_samples.astype(F32), 1.0)
    vis_soft = jnp.where(valid_samples > 0, vis_sum * inv_vs, 1.0)
    occ_soft = jnp.where(occluded > 0, min_occ, F32(C.NRD_FP16_MAX))
    pen_soft = jnp.where(occluded > 0, pen_sum / jnp.maximum(occluded.astype(F32), 1.0), 0.0)
    color_soft = vwhere(
        vis_sum > 0.01, vscale(color_sum, 1.0 / jnp.maximum(vis_sum, 1e-12)), vzeros(shape)
    )

    visibility = jnp.where(soft, vis_soft, vis_h)
    occluder = jnp.where(soft, occ_soft, occ_h)
    penumbra = jnp.where(soft, pen_soft, 0.0)
    shadow_color = vwhere(soft, color_soft, color_h)

    lit = state["is_ambient"] | ~state["active"]
    visibility = jnp.where(lit, 1.0, visibility)
    occluder = jnp.where(lit, F32(C.NRD_FP16_MAX), occluder)
    penumbra = jnp.where(lit, 0.0, penumbra)
    shadow_color = vwhere(lit, vconst(shape, 1.0, 1.0, 1.0), shadow_color)
    return visibility, penumbra, occluder, shadow_color, rays


def _shadow_disabled_stub(shape, seed):
    return (seed, jnp.ones(shape, F32), jnp.zeros(shape, F32),
            jnp.full(shape, C.NRD_FP16_MAX, F32),
            vconst(shape, 1.0, 1.0, 1.0), jnp.zeros(shape, I32))


def _soft_shadow_k(ks, cfg, pos, nrm, active, lt, lp, lrad, lsamp, seed):
    """CalculateSoftShadow for one gathered light per lane (Common.hlsli:1199+)."""
    if "shadow" in _DEBUG_DISABLE:  # perf-bisect kill switch: fully lit
        return _shadow_disabled_stub(pos[0].shape, seed)
    seed, state = _soft_shadow_setup(ks, cfg, pos, nrm, active, lt, lp, lrad, lsamp, seed)
    ilv_all = (_SHADOW_ILV_MODE >= 2 and _SHADOW_COUNT
               and ks.mesh is not None and ks.mesh.num_inst <= 8
               and len(state["samples"]) > 1)
    if ilv_all:
        traces = shadow_trace_multi_k(
            ks, state["origin"],
            [(td, tm) for td, tm, _, _ in state["samples"]])
    else:
        traces = [shadow_trace_k(ks, state["origin"], td, tm)
                  for td, tm, _, _ in state["samples"]]
    visibility, penumbra, occluder, shadow_color, rays = _soft_shadow_accum(state, traces)
    return seed, visibility, penumbra, occluder, shadow_color, rays


def _soft_shadow_pair_k(ks, cfg, pos, nrm, a_args, b_args, seed):
    """Both dominant lights' CalculateSoftShadow with paired traces: the
    RNG stream is consumed light-by-light exactly as the sequential calls
    would (all of a's draws, then all of b's — bit-identical sample dirs),
    but sample s of light a and sample s of light b resolve through ONE
    fused mesh walk (shadow_trace2_k). Outputs are bit-identical to two
    _soft_shadow_k calls; only the mesh walk count halves.

    With the interleaved count walk available (RTVS_MK_SHADOW_ILV=2,
    <=8-instance mesh), ALL samples of BOTH lights resolve through one
    interleaved walk group instead (shadow_trace_multi_k) — outputs stay
    bit-identical (each walk is independent), while every walk's node-load
    latency pipelines against the others'."""
    seed, st_a = _soft_shadow_setup(ks, cfg, pos, nrm, *a_args, seed)
    seed, st_b = _soft_shadow_setup(ks, cfg, pos, nrm, *b_args, seed)
    ilv_all = (_SHADOW_ILV_MODE >= 2 and _SHADOW_COUNT and not _SHADOW_FUSE
               and ks.mesh is not None and ks.mesh.num_inst <= 8)
    if ilv_all:
        rays = []
        for (da, ma, _, _), (db, mb, _, _) in zip(st_a["samples"],
                                                  st_b["samples"]):
            rays += [(da, ma), (db, mb)]
        results = shadow_trace_multi_k(ks, st_a["origin"], rays)
        tr_a = results[0::2]
        tr_b = results[1::2]
    else:
        tr_a, tr_b = [], []
        for (da, ma, _, _), (db, mb, _, _) in zip(st_a["samples"],
                                                  st_b["samples"]):
            ra, rb = shadow_trace2_k(ks, st_a["origin"], da, ma, db, mb)
            tr_a.append(ra)
            tr_b.append(rb)
    out_a = _soft_shadow_accum(st_a, tr_a)
    out_b = _soft_shadow_accum(st_b, tr_b)
    return seed, out_a, out_b


def shadow_trace_multi_k(ks: KScene, o, rays):
    """N same-origin shadow traces resolved through ONE interleaved mesh
    walk group (mesh_shadow_ilv_count_k). Analytic prim tests stay per
    ray (cheap static loops); outputs are bit-identical to N sequential
    shadow_trace_k calls. rays: list of (direction, max_dist)."""
    res_an = [_shadow_analytic_k(ks, o, d, m) for d, m in rays]
    if ks.mesh is None or "mesh_shadow" in _DEBUG_DISABLE:
        return [(v, c, x) for v, c, x, _ in res_an]
    km = ks.mesh
    nr = len(rays)
    blk_is = [b.astype(I32) for _, _, _, b in res_an]
    seeds = [bi if _SHADOW_SEED else None for bi in blk_is]

    def run(_):
        outs = mesh_shadow_ilv_count_k(
            km, o, [(d, m, s) for (d, m), s in zip(rays, seeds)])
        flat = []
        for mv, mc, mo in outs:
            flat += [mv, mc[0], mc[1], mc[2], mo]
        return tuple(flat)

    if _PRECULL:
        lo, hi = _mesh_root_bb(km)
        tmin = F32(C.RAY_TMIN)
        need_l = None
        for (d, m), bi in zip(rays, blk_is):
            pre = _ray_aabb_k(o, _safe_inv(d), lo, hi, tmin, m)
            p = (pre & (bi == 0)) if _SHADOW_SEED else pre
            need_l = p if need_l is None else (need_l | p)
        zero = o[0] * 0.0
        one = 1.0 + zero
        inf = zero + F32(C.NRD_FP16_MAX)

        def skip(_):
            return tuple([one, one, one, one, inf] * nr)

        flat = jax.lax.cond(jnp.any(need_l), run, skip, 0)
    else:
        flat = run(0)
    out = []
    for r in range(nr):
        vis, col, occ, _ = res_an[r]
        mv = flat[5 * r]
        mc = (flat[5 * r + 1], flat[5 * r + 2], flat[5 * r + 3])
        mo = flat[5 * r + 4]
        out.append((vis * mv, vmul(col, mc), jnp.minimum(occ, mo)))
    return out


def _select_dominant_k(ks, pos, nrm):
    """SelectDominantLights (Common.hlsli:1008-1047)."""
    shape = pos[0].shape
    max_shadow = jnp.minimum(ks.max_shadow_lights, 2)
    max_shadow = jnp.where(max_shadow == 0, 2, max_shadow)
    top0_i = jnp.zeros(shape, I32)
    top0_c = jnp.full(shape, -1.0, F32)
    top1_i = jnp.zeros(shape, I32)
    top1_c = jnp.full(shape, -1.0, F32)
    count = jnp.zeros(shape, I32)
    for li in range(min(ks.l_cap, 8)):
        lt, lp, lc, lint, lrad, lsamp, lval = _light_fields(ks, li)
        in_range = (li < ks.num_lights) & lval
        skip = (lt == C.LIGHT_TYPE_AMBIENT) | ~in_range
        is_dir, l_vec, atten, ndotl, _dist = _light_geom_k(
            ks, lt, lp, pos, nrm
        )
        contrib = ndotl * atten * lint * _luminance(lc[0], lc[1], lc[2])
        beats0 = ~skip & (contrib > top0_c)
        beats1 = ~skip & ~beats0 & (contrib > top1_c) & (max_shadow > 1)
        top1_i = jnp.where(beats0, top0_i, jnp.where(beats1, li, top1_i))
        top1_c = jnp.where(beats0, top0_c, jnp.where(beats1, contrib, top1_c))
        top0_i = jnp.where(beats0, li, top0_i)
        top0_c = jnp.where(beats0, contrib, top0_c)
        inserted = beats0 | beats1
        count = jnp.where(inserted, jnp.minimum(count + 1, max_shadow), count)
    return top0_i, top0_c, top1_i, top1_c, count


def _gather_light(ks, idx):
    """Per-lane light parameter gather via static loop over L."""
    shape = idx.shape
    lt = jnp.zeros(shape, I32)
    lp = vzeros(shape)
    lrad = jnp.zeros(shape, F32)
    lsamp = jnp.ones(shape, F32)
    for li in range(ks.l_cap):
        sel = idx == li
        t, p, c, inten, rad, samp, val = _light_fields(ks, li)
        lt = jnp.where(sel, t, lt)
        lp = vwhere(sel, vbroadcast(shape, p[0], p[1], p[2]), lp)
        lrad = jnp.where(sel, rad, lrad)
        lsamp = jnp.where(sel, samp, lsamp)
    return lt, lp, lrad, lsamp


# ---------------------------------------------------------------------------
# The megakernel body
# ---------------------------------------------------------------------------
def _blue_noise_tile_channels(bn_ref, frame, s, row0):
    """Blue-noise values for the whole tile, per channel.

    RayGen samples BlueNoiseTex at ((pixel + offset(frame, s)) & 15)
    (RayGen.hlsl:9-15). Tile origins are multiples of 16 in x (TILE_W=128)
    and rows shift by row0, so the tiled pattern is one (oy, ox) roll of the
    16x16 texture, computed with static-shift selects.
    """
    ox = (frame * 3 + s * 11) % 16
    oy = (frame * 5 + s * 7 + row0) % 16
    outs = []
    for c in range(4):
        base = bn_ref[c * 16 : (c + 1) * 16, 0:16]  # (16,16)
        dbl_r = jnp.concatenate([base, base], axis=0)  # (32,16)
        rolled = base
        for k in range(1, 16):
            rolled = jnp.where(oy == k, dbl_r[k : k + 16, :], rolled)
        dbl_c = jnp.concatenate([rolled, rolled], axis=1)  # (16,32)
        rolled2 = rolled
        for k in range(1, 16):
            rolled2 = jnp.where(ox == k, dbl_c[:, k : k + 16], rolled2)
        tile = jnp.concatenate([rolled2] * (TILE_H // 16), axis=0)
        tile = jnp.concatenate([tile] * (TILE_W // 16), axis=1)
        outs.append(tile)
    return outs


def _hit_context_k(ks, cfg, cur, traced):
    """Closest hit + surface/material context shared by the full shade and
    the children-only re-derivation (two-phase renderer)."""
    (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags, c_stype, c_sidx) = cur
    shape = c_depth.shape

    skip_on = (c_rflags & C.RAYFLAG_SKIP_SELF) != 0
    skip_t = jnp.where(skip_on, c_stype, _INVALID)
    skip_i = jnp.where(skip_on, c_sidx, 0)
    tmin = jnp.full(shape, C.RAY_TMIN, F32)
    # Inactive lanes trace an empty interval: their results were always
    # masked, but with a mesh they must also stop steering the packet walk
    # (a stale ray would drag the whole tile through its BVH nodes).
    tmax = jnp.where(traced, F32(C.RAY_TMAX), 0.0)
    # Deferred mesh-glass thickness: a refract child tagged by
    # _spawn_children_k (instance+1 in c_rflags bits 8+) resolves its
    # same-instance thickness DURING this closest walk — its ray IS the
    # reference's thickness ray (RayGen.hlsl:650/776 share the origin
    # hitPosition + refractDir*0.002) — and the Beer factor the reference
    # applied at spawn (RayGen.hlsl:674-678) multiplies the path here
    # instead; the product is identical.
    fused_thick = (ks.mesh is not None and cfg.any_absorption
                   and "mesh_thick" not in _DEBUG_DISABLE
                   and "mesh_closest" not in _DEBUG_DISABLE)
    if fused_thick:
        thick_inst = jnp.where(traced, (c_rflags >> 8) - 1, -1)
        isect = intersect_closest_k(ks, c_o, c_d, tmin, tmax, skip_t, skip_i,
                                    thick_inst=thick_inst)
        t_th = jnp.where((thick_inst >= 0) & isect["thick_hit"],
                         isect["thick_t"], 0.0)
        tscale = t_th * F32(C.GLASS_ABSORPTION_SCALE)
        ab = vzeros(shape)
        for i in range(ks.mesh.num_inst):
            row = ks.mesh.inst_tbl[pl.ds(i, 1), :]
            sel = thick_inst == i
            ab = (jnp.where(sel, row[0, 1], ab[0]),
                  jnp.where(sel, row[0, 2], ab[1]),
                  jnp.where(sel, row[0, 3], ab[2]))
        has_th = t_th > 0.0
        pending_beer = (jnp.where(has_th, jnp.exp(-ab[0] * tscale), 1.0),
                        jnp.where(has_th, jnp.exp(-ab[1] * tscale), 1.0),
                        jnp.where(has_th, jnp.exp(-ab[2] * tscale), 1.0))
    else:
        pending_beer = None
        isect = intersect_closest_k(ks, c_o, c_d, tmin, tmax, skip_t, skip_i)

    hit_mask = isect["hit"] & traced
    pos = isect["pos"]
    n_out = isect["n_out"]
    front_face = vdot(c_d, n_out) < 0.0
    nrm = vwhere(front_face, n_out, vscale(n_out, -1.0))
    if ks.mesh is not None:
        im = isect["is_mesh"]
        # logical merge: select with i1 value operands doesn't lower on TPU
        front_face = (im & isect["mesh_front"]) | (~im & front_face)
        nrm = vwhere(im, isect["mesh_nrm"], nrm)

    albedo = isect["albedo"]
    transmission = isect["transmission"]
    ior = isect["ior"]

    if ks.p_cap > 0:
        checker = _checker_albedo(pos, ks.cam_pos, ks.cam_fwd)
        albedo = vwhere(isect["is_plane"], checker, albedo)
        transmission = jnp.where(isect["is_plane"], 0.0, transmission)
        ior = jnp.where(isect["is_plane"], 1.5, ior)

    is_glass = transmission > 0.01

    # Glass f0 (RayGen.hlsl:283-334, 623-627)
    specular = isect["specular"]
    f0_from_ior = jnp.square((ior - 1.0) / (ior + 1.0))
    spec_blend = jnp.clip(specular, 0.0, 1.0)
    f0_glass = f0_from_ior + (spec_blend - f0_from_ior) * spec_blend
    metallic = isect["metallic"]
    f0 = vlerp(vconst(shape, 0.04, 0.04, 0.04), albedo, metallic)

    return dict(
        isect=isect, hit_mask=hit_mask, pos=pos, nrm=nrm, front_face=front_face,
        albedo=albedo, metallic=metallic, roughness=isect["roughness"],
        transmission=transmission, ior=ior, specular=specular,
        emission=isect["emission"], absorption=isect["absorption"],
        is_glass=is_glass, f0_glass=f0_glass, f0=f0, spec_blend=spec_blend,
        pending_beer=pending_beer,
    )


def _shade_and_spawn_k(ks, cfg, xx, yy, frame, s, cur, traced):
    """Port of wavefront._shade_and_spawn in component style."""
    shape = xx.shape
    (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags, c_stype, c_sidx) = cur

    hx = _hit_context_k(ks, cfg, cur, traced)
    if hx["pending_beer"] is not None:
        # Deferred mesh-glass refraction absorption (see _hit_context_k):
        # scales this ray's throughput — children and the returned radiance
        # both inherit it, exactly like the reference's spawn-time multiply.
        c_tp = vmul(c_tp, hx["pending_beer"])
        cur = (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags,
               c_stype, c_sidx)
    isect = hx["isect"]
    hit_mask = hx["hit_mask"]
    pos, nrm, front_face = hx["pos"], hx["nrm"], hx["front_face"]
    albedo, metallic, roughness = hx["albedo"], hx["metallic"], hx["roughness"]
    transmission, ior, specular = hx["transmission"], hx["ior"], hx["specular"]
    emission, absorption = hx["emission"], hx["absorption"]
    is_glass, f0_glass, spec_blend = hx["is_glass"], hx["f0_glass"], hx["spec_blend"]

    view = vscale(c_d, -1.0)

    # Glass highlights (RayGen.hlsl:283-334)
    highlight = vzeros(shape)
    if cfg.any_glass and cfg.has_lights:
        for li in range(ks.l_cap):
            lt, lp, lc, lint, lrad, lsamp, lval = _light_fields(ks, li)
            lv = (li < ks.num_lights) & lval
            non_ambient = lv & (lt != C.LIGHT_TYPE_AMBIENT)
            is_dir, l_vec, atten, ndotl, _dist = _light_geom_k(ks, lt, lp, pos, nrm)
            half = vnorm(vadd(l_vec, view))
            shininess = jnp.maximum(64.0, 512.0 * (1.0 - roughness))
            spec = jnp.power(jnp.maximum(0.0, vdot(nrm, half)), shininess)
            sf = _fresnel_schlick(jnp.maximum(0.0, vdot(half, view)), f0_glass)
            w = jnp.where(non_ambient & (ndotl > 0.0), lint * spec * sf * atten, 0.0)
            highlight = vadd(highlight, (lc[0] * w, lc[1] * w, lc[2] * w))
        scale_hl = spec_blend * (1.0 - roughness)
        highlight = vscale(highlight, jnp.where(specular > 0.01, scale_hl, 0.0))
    glass_color = vadd(highlight, emission)

    # PBR direct lighting
    f0 = hx["f0"]
    diffuse_color = vscale(albedo, 1.0 - metallic)
    sample_idx = s.astype(U32) + c_depth.astype(U32) * U32(4096)
    seed = rng_init_t(xx, yy, frame, sample_idx, C.RNG_SALT_SHADOW)

    shade_mask = hit_mask & ~is_glass
    ambient = vzeros(shape)
    dd = vzeros(shape)
    ds = vzeros(shape)
    best_vis = jnp.ones(shape, F32)
    best_pen = jnp.zeros(shape, F32)
    best_dist = jnp.full(shape, C.NRD_FP16_MAX, F32)
    ray_count = jnp.zeros(shape, I32)

    if cfg.has_lights:
        top0_i, top0_c, top1_i, top1_c, top_count = _select_dominant_k(ks, pos, nrm)
        sel0 = (top_count > 0) & (top0_c > 0.0)
        sel1 = (top_count > 1) & (top1_c > 0.0)
        a_idx = jnp.where(sel0 & sel1, jnp.minimum(top0_i, top1_i),
                          jnp.where(sel0, top0_i, top1_i))
        b_idx = jnp.where(sel0 & sel1, jnp.maximum(top0_i, top1_i), a_idx)
        a_sel = sel0 | sel1
        b_sel = sel0 & sel1

        shadow = {}
        light_args = {}
        for which, idx, selm in (("a", a_idx, a_sel), ("b", b_idx, b_sel)):
            if which == "b" and "shadow2" in _DEBUG_DISABLE:
                # perf-bisect kill switch: the SECOND dominant light renders
                # unshadowed (its direct lighting stays), isolating what the
                # secondary soft-shadow trace chain costs per frame.
                shadow[which] = (jnp.ones(shape, F32), jnp.zeros(shape, F32),
                                 jnp.full(shape, C.NRD_FP16_MAX, F32),
                                 vconst(shape, 1.0, 1.0, 1.0))
                continue
            lt_g, lp_g, lrad_g, lsamp_g = _gather_light(ks, idx)
            is_dir, l_vec, atten, ndotl, _dist = _light_geom_k(
                ks, lt_g, (lp_g[0], lp_g[1], lp_g[2]), pos, nrm
            )
            # ComputeShadowSamples (Common.hlsli:1062-1079)
            base = jnp.clip(lsamp_g.astype(I32), 1, 16)
            ratio = top1_c / jnp.maximum(top0_c, 0.001)
            reduced = jnp.maximum(1, (base.astype(F32) * ratio).astype(I32))
            secondary = jnp.minimum(reduced, base // 2 + 1)
            samples = jnp.where(top0_i == idx, base, jnp.where(top1_i == idx, secondary, 1))
            active = shade_mask & selm & (ndotl > 0.0)
            light_args[which] = (active, lt_g, lp_g, lrad_g, samples.astype(F32))

        # Pair the two dominant lights' traces through one fused mesh walk
        # when a mesh is present (shadow cost there is node-descent-bound;
        # analytic-only scenes gain nothing from pairing). Outputs and RNG
        # stream are bit-identical to the sequential calls.
        fuse = (ks.mesh is not None and len(light_args) == 2
                and "shadow" not in _DEBUG_DISABLE
                and "mesh_shadow" not in _DEBUG_DISABLE
                and _SHADOW_FUSE and cfg.max_soft_samples <= 8)
        if fuse:
            seed, out_a, out_b = _soft_shadow_pair_k(
                ks, cfg, pos, nrm, light_args["a"], light_args["b"], seed
            )
            for which, out in (("a", out_a), ("b", out_b)):
                vis, pen, occ, scol, rr = out
                shadow[which] = (vis, pen, occ, scol)
                ray_count = ray_count + jnp.where(light_args[which][0], rr, 0)
        else:
            for which in ("a", "b"):
                if which not in light_args:
                    continue
                seed, vis, pen, occ, scol, rr = _soft_shadow_k(
                    ks, cfg, pos, nrm, *light_args[which], seed
                )
                shadow[which] = (vis, pen, occ, scol)
                ray_count = ray_count + jnp.where(light_args[which][0], rr, 0)

        best_w = jnp.full(shape, -1.0, F32)
        for li in range(ks.l_cap):
            lt, lp, lc, lint, lrad, lsamp, lval = _light_fields(ks, li)
            lv = (li < ks.num_lights) & lval
            is_ambient = lt == C.LIGHT_TYPE_AMBIENT
            is_dir, l_vec, atten, ndotl, _dist = _light_geom_k(ks, lt, lp, pos, nrm)

            amb_term = vlerp(diffuse_color, vscale(albedo, 0.3), metallic)
            amb_mask = jnp.where(lv & is_ambient, 1.0, 0.0)
            ambient = vadd(
                ambient,
                (
                    lc[0] * lint * amb_term[0] * amb_mask,
                    lc[1] * lint * amb_term[1] * amb_mask,
                    lc[2] * lint * amb_term[2] * amb_mask,
                ),
            )

            lit = lv & ~is_ambient & (ndotl > 0.0)
            use_a = (a_idx == li) & a_sel
            use_b = (b_idx == li) & b_sel
            vis = jnp.where(use_a, shadow["a"][0], jnp.where(use_b, shadow["b"][0], 1.0))
            pen = jnp.where(use_a, shadow["a"][1], jnp.where(use_b, shadow["b"][1], 0.0))
            occ = jnp.where(
                use_a, shadow["a"][2], jnp.where(use_b, shadow["b"][2], C.NRD_FP16_MAX)
            )
            scol = vwhere(use_a, shadow["a"][3],
                          vwhere(use_b, shadow["b"][3], vconst(shape, 1.0, 1.0, 1.0)))

            w = ndotl * atten * lint
            better = lit & (c_depth == 0) & (w > best_w)
            best_w = jnp.where(better, w, best_w)
            best_vis = jnp.where(better, vis, best_vis)
            best_pen = jnp.where(better, pen, best_pen)
            best_dist = jnp.where(better, occ, best_dist)

            shadow_amount = jnp.clip((1.0 - vis) * ks.shadow_strength, 0.0, 1.0)
            adj = lint * atten * (1.0 - shadow_amount)
            radiance = (lc[0] * adj * scol[0], lc[1] * adj * scol[1], lc[2] * adj * scol[2])

            half = vnorm(vadd(view, l_vec))
            ndotv = jnp.maximum(vdot(nrm, view), 0.001)
            ndoth = jnp.maximum(vdot(nrm, half), 0.0)
            vdoth = jnp.maximum(vdot(view, half), 0.0)
            fr = _fresnel3(vdoth, f0)
            dterm = _ggx_d(ndoth, jnp.maximum(roughness, 0.04))
            g = _smith_g(ndotv, ndotl, roughness)
            sden = (dterm * g) / (4.0 * ndotv * ndotl + 0.001)
            spec_brdf = vscale(fr, sden)
            kd = ((1.0 - fr[0]) * (1.0 - metallic), (1.0 - fr[1]) * (1.0 - metallic),
                  (1.0 - fr[2]) * (1.0 - metallic))
            inv_pi = F32(1.0 / C.PI)
            diff_brdf = (kd[0] * diffuse_color[0] * inv_pi, kd[1] * diffuse_color[1] * inv_pi,
                         kd[2] * diffuse_color[2] * inv_pi)
            lm = jnp.where(lit, ndotl, 0.0)
            dd = vadd(dd, vmul(diff_brdf, vscale(radiance, lm)))
            ds = vadd(ds, vmul(spec_brdf, vscale(radiance, lm)))
    else:
        # No-light fallback (RayGen.hlsl:452-501), depth 0 only.
        fb_pos = vconst(shape, 3.0, 5.0, -3.0)
        fb_needed = c_depth == 0
        to_l = vsub(fb_pos, pos)
        fb_dist = vlen(to_l)
        fb_l = vscale(to_l, 1.0 / jnp.maximum(fb_dist, 1e-12))
        fb_atten = _atten(ks, fb_dist)
        fb_ndotl = jnp.maximum(vdot(nrm, fb_l), 0.0)
        fb_active = shade_mask & fb_needed
        origin = vadd(pos, vscale(nrm, F32(C.SHADOW_NORMAL_OFFSET)))
        fb_vis, fb_scol, fb_occ = shadow_trace_k(
            ks, origin, fb_l, jnp.where(fb_active, fb_dist, 0.0)
        )
        ray_count = ray_count + fb_active.astype(I32)
        fb_amount = jnp.clip((1.0 - fb_vis) * ks.shadow_strength, 0.0, 1.0)
        adj = F32(1.5) * fb_atten * (1.0 - fb_amount)
        radiance = vscale(fb_scol, adj)
        half = vnorm(vadd(view, fb_l))
        ndotv = jnp.maximum(vdot(nrm, view), 0.001)
        ndoth = jnp.maximum(vdot(nrm, half), 0.0)
        vdoth = jnp.maximum(vdot(view, half), 0.0)
        fr = _fresnel3(vdoth, f0)
        dterm = _ggx_d(ndoth, jnp.maximum(roughness, 0.04))
        g = _smith_g(ndotv, fb_ndotl, roughness)
        sden = (dterm * g) / (4.0 * ndotv * fb_ndotl + 0.001)
        lm = jnp.where((fb_ndotl > 0.0) & fb_needed, fb_ndotl, 0.0)
        inv_pi = F32(1.0 / C.PI)
        kd = ((1.0 - fr[0]) * (1.0 - metallic), (1.0 - fr[1]) * (1.0 - metallic),
              (1.0 - fr[2]) * (1.0 - metallic))
        diff_brdf = (kd[0] * diffuse_color[0] * inv_pi, kd[1] * diffuse_color[1] * inv_pi,
                     kd[2] * diffuse_color[2] * inv_pi)
        dd = vmul(diff_brdf, vscale(radiance, lm))
        ds = vmul(vscale(fr, sden), vscale(radiance, lm))
        fb_amb = vscale(vlerp(diffuse_color, vscale(albedo, 0.3), metallic), 0.2)
        ambient = vwhere(fb_needed, fb_amb, ambient)
        best_vis = jnp.where(fb_needed, fb_vis, best_vis)
        best_dist = jnp.where(
            fb_needed, jnp.where(fb_vis < 0.99, fb_occ, C.NRD_FP16_MAX), best_dist
        )

    direct_weight = 1.0 - metallic * (1.0 - roughness * 0.5) * 0.5
    final = vadd(vadd(ambient, vscale(dd, direct_weight)), vadd(ds, emission))
    final = (jnp.maximum(final[0], 0.0), jnp.maximum(final[1], 0.0), jnp.maximum(final[2], 0.0))

    color = vwhere(is_glass, glass_color, final)
    # Photon debug 3/4 (ClosestHit.hlsl:141-157)
    if cfg.photon_debug_mode in (3, 4):
        v = jnp.clip(transmission if cfg.photon_debug_mode == 3 else metallic, 0.0, 1.0)
        dbg_on = (c_depth == 0) & hit_mask
        color = vwhere(dbg_on, (v, v, v), color)
    sky = sky_color3(c_d)
    miss_color = vscale(sky, c_boost)
    color = vwhere(hit_mask, color, miss_color)
    bad = ~vfinite(color)
    color = vwhere(bad, vmul(c_tp, sky), color)

    diff_rad = vadd(vadd(ambient, vscale(dd, direct_weight)), emission)
    diff_rad = vwhere(is_glass, vzeros(shape), diff_rad)
    diff_rad = vwhere(hit_mask, diff_rad, vscale(sky, c_boost))
    spec_rad = vwhere(is_glass, highlight, ds)
    spec_rad = vwhere(hit_mask, spec_rad, vzeros(shape))
    if cfg.photon_debug_mode in (3, 4):
        v = jnp.clip(transmission if cfg.photon_debug_mode == 3 else metallic, 0.0, 1.0)
        dbg_on = (c_depth == 0) & hit_mask
        diff_rad = vwhere(dbg_on, (v, v, v), diff_rad)
        spec_rad = vwhere(dbg_on, vzeros(shape), spec_rad)
    ng = hit_mask & ~is_glass
    rec_vis = jnp.where(ng, best_vis, 1.0)
    rec_pen = jnp.where(ng, best_pen, 0.0)
    rec_dist = jnp.where(ng, best_dist, C.NRD_FP16_MAX)
    hit_distance = jnp.where(hit_mask, isect["t"], F32(10000.0))

    children, extra = _spawn_children_k(ks, cfg, xx, yy, frame, s, cur, hx)
    ray_count = ray_count + extra
    records = dict(
        color=color, diffuse=diff_rad, specular=spec_rad, hit_distance=hit_distance,
        shadow_vis=rec_vis, shadow_pen=rec_pen, shadow_dist=rec_dist, hit_mask=hit_mask,
        normal=nrm, roughness=roughness, albedo=albedo, metallic=metallic,
        transmission=transmission, position=pos,
        obj_id=jnp.where(hit_mask, isect["type"] * 65536 + isect["index"], -1),
    )
    if hx["pending_beer"] is not None:
        # The caller accumulates contrib = c_tp(unscaled) * color, so the
        # deferred Beer rides the radiance (records are depth-0 only and
        # tagged lanes are depth>=1 — they never record).
        color = vmul(color, hx["pending_beer"])
    return color, records, children, ray_count


def _spawn_children_k(ks, cfg, xx, yy, frame, s, cur, hx):
    """Child-ray computation (RayGen.hlsl:591-847), shared by the full shade
    and the two-phase re-derivation. Returns (children dict, extra ray count
    per lane — the thickness rays)."""
    (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags, c_stype, c_sidx) = cur
    shape = c_depth.shape
    hit_mask = hx["hit_mask"]
    pos, nrm, front_face = hx["pos"], hx["nrm"], hx["front_face"]
    albedo, metallic, roughness = hx["albedo"], hx["metallic"], hx["roughness"]
    transmission, ior = hx["transmission"], hx["ior"]
    absorption, is_glass, f0_glass = hx["absorption"], hx["is_glass"], hx["f0_glass"]
    isect = hx["isect"]
    sample_idx = s.astype(U32) + c_depth.astype(U32) * U32(4096)
    extra = jnp.zeros(shape, I32)

    if cfg.any_glass:
        entering = front_face
        eta = jnp.where(entering, 1.0 / ior, ior)
        refl0 = vnorm(reflect3(c_d, nrm))
        cosi = vdot(nrm, c_d)
        kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
        tir = kk < 0.0
        sq = jnp.sqrt(jnp.maximum(kk, 0.0))
        refr = vsub(vscale(c_d, eta), vscale(nrm, eta * cosi + sq))
        refr = vwhere(tir, vzeros(shape), vnorm(refr))
        rng_rf = rng_init_t(xx, yy, frame, sample_idx, C.RNG_SALT_REFLECT)
        _, pert_rf = perturb_reflection_t(refl0, nrm, roughness, rng_rf)
        rng_rr = rng_init_t(xx, yy, frame, sample_idx, C.RNG_SALT_REFRACT)
        _, pert_rr = perturb_reflection_t(refr, vscale(nrm, -1.0), roughness, rng_rr)
        gp = (roughness > 0.01) & (c_depth == 0)
        g_reflect = vwhere(gp, pert_rf, refl0)
        g_refract = vwhere(gp & ~tir, pert_rr, refr)

        cos_theta = jnp.clip(vdot(vscale(c_d, -1.0), nrm), 0.0, 1.0)
        fres = _fresnel_schlick(cos_theta, f0_glass)
        fres = jnp.where(tir, 1.0, fres)
        reflect_tp_s = jnp.clip(fres, 0.0, 1.0)
        tint = vwhere(entering, vlerp(vconst(shape, 1.0, 1.0, 1.0), albedo,
                                      F32(C.GLASS_TINT_STRENGTH)),
                      vconst(shape, 1.0, 1.0, 1.0))
        rt = (1.0 - fres) * jnp.clip(transmission, 0.0, 1.0)
        refract_tp = (jnp.clip(rt * tint[0], 0.0, 1.0), jnp.clip(rt * tint[1], 0.0, 1.0),
                      jnp.clip(rt * tint[2], 0.0, 1.0))

        glass_spawn = hit_mask & is_glass
        thick_tag = jnp.zeros(shape, I32)
        if cfg.any_absorption:
            fused_thick = (ks.mesh is not None
                           and "mesh_thick" not in _DEBUG_DISABLE
                           and "mesh_closest" not in _DEBUG_DISABLE)
            th_o = vadd(pos, vscale(g_refract, F32(C.SELF_OFFSET)))
            do_th = glass_spawn & ~tir
            th_type = jnp.where(do_th, isect["type"], _INVALID)
            if fused_thick:
                # Mesh-glass lanes defer their thickness to the refract
                # child's own closest walk (see _hit_context_k): tag the
                # child with instance+1 in rflags bits 8+. The thickness
                # ray still counts (`extra`) — the reference traces it
                # (RayGen.hlsl:650-670), we just resolve it for free.
                absorbing = ((absorption[0] > 0.0) | (absorption[1] > 0.0)
                             | (absorption[2] > 0.0))
                is_mesh_th = th_type == C.OBJECT_TYPE_MESH
                thick_tag = jnp.where(is_mesh_th & absorbing,
                                      (isect["index"] + 1) << 8, 0)
                th_type = jnp.where(is_mesh_th, _INVALID, th_type)
            # idle lanes query a type that matches nothing so the mesh walk
            # only follows lanes that actually need a thickness
            th_hit, th_t = thickness_trace_k(
                ks, th_o, g_refract, th_type, isect["index"],
                include_mesh=not fused_thick,
            )
            extra = extra + do_th.astype(I32)
            thickness = jnp.where(do_th & th_hit, th_t, 0.0)
            tscale = thickness * F32(C.GLASS_ABSORPTION_SCALE)
            has_th = ~tir & (thickness > 0.0)
            r_ab = (jnp.where(has_th, jnp.exp(-absorption[0] * tscale), 1.0),
                    jnp.where(has_th, jnp.exp(-absorption[1] * tscale), 1.0),
                    jnp.where(has_th, jnp.exp(-absorption[2] * tscale), 1.0))
            refract_tp = vmul(refract_tp, r_ab)
        # else: exp(-0*thickness) == 1 — the thickness trace compiles out
        # (cfg.any_absorption, scene/flatten.py)
        reflect_tp = vscale(c_tp, reflect_tp_s)
        refract_tp_full = vmul(refract_tp, c_tp)
    else:
        glass_spawn = jnp.zeros(shape, bool)
        thick_tag = jnp.zeros(shape, I32)
        tir = jnp.zeros(shape, bool)
        entering = front_face
        g_reflect = vzeros(shape)
        g_refract = vzeros(shape)
        reflect_tp = vzeros(shape)
        refract_tp_full = vzeros(shape)

    if cfg.any_metal:
        is_metal = ~is_glass & (metallic > 0.1)
        refl_m = reflect3(c_d, nrm)
        if "perturb" in _DEBUG_DISABLE:
            metal_dir = refl_m
        else:
            rng_m = rng_init_t(xx, yy, frame, sample_idx, C.RNG_SALT_REFLECT)
            _, metal_dir = perturb_reflection_t(refl_m, nrm, roughness, rng_m)
        if "fresnel" in _DEBUG_DISABLE:
            metal_tp = c_tp
        else:
            ndotv_m = jnp.clip(vdot(nrm, vscale(c_d, -1.0)), 0.0, 1.0)
            f_m = _fresnel3(ndotv_m, hx["f0"])
            scale_m = (1.0 - roughness * 0.5) * jnp.where(
                c_depth > 0, F32(C.METAL_SECONDARY_BOOST), F32(1.0)
            )
            metal_tp = vmul(vscale(f_m, scale_m), c_tp)
        metal_spawn = hit_mask & is_metal
        if "spawn" in _DEBUG_DISABLE:
            metal_spawn = jnp.zeros(shape, bool)
    else:
        metal_spawn = jnp.zeros(shape, bool)
        metal_dir = vzeros(shape)
        metal_tp = vzeros(shape)

    children = dict(
        glass_spawn=glass_spawn, metal_spawn=metal_spawn, tir=tir, entering=entering,
        reflect_dir=g_reflect, refract_dir=g_refract, metal_dir=metal_dir,
        reflect_tp=reflect_tp, refract_tp=refract_tp_full, metal_tp=metal_tp,
        hit_pos=pos, normal=nrm, hit_type=isect["type"], hit_index=isect["index"],
        thick_tag=thick_tag, stat=isect["visits"],
    )
    return children, extra


def _children_only_k(ks, cfg, xx, yy, frame, s, cur, traced):
    """Re-derive one iteration's children WITHOUT lighting/records — the
    two-phase renderer's phase-B prologue. Bitwise-identical child state to
    _shade_and_spawn_k (same intersection, material, RNG and spawn math);
    only the radiance/record computation is omitted."""
    hx = _hit_context_k(ks, cfg, cur, traced)
    if hx["pending_beer"] is not None:
        c_tp = vmul(cur[4], hx["pending_beer"])
        cur = cur[:4] + (c_tp,) + cur[5:]
    children, extra = _spawn_children_k(ks, cfg, xx, yy, frame, s, cur, hx)
    return children, extra


def _dirty_helpers(xx, yy):
    # Mosaic layout workaround: while-loop carries initialized from splat
    # constants get a replicated layout, but once the loop body makes them
    # varying Mosaic hits "Invalid relayout: non-singleton dimension is
    # replicated in destination but not in source". `dirty` is a provably
    # zero but data-dependent vector that forces a varying initial layout.
    # xor of both iotas varies along BOTH dims, so the zero inherits the
    # fully-varying {0,0} layout (xx alone is sublane-replicated: "{*,0}").
    dirty = (xx ^ yy) >> 31  # i32 zeros (operands >= 0)
    dirty_f = dirty.astype(F32)

    def vary_i(x):
        return x | dirty

    def vary_f(x):
        return x + dirty_f

    return dirty, dirty_f, vary_i, vary_f


def _fresh_acc(shape, vary_i, vary_f):
    """Zeroed per-sample accumulator set (varying-layout inits)."""
    vz = lambda: tuple(vary_f(c) for c in vzeros(shape))  # noqa: E731
    return dict(
        color=vz(), primary=vz(),
        bounce=vary_i(jnp.zeros(shape, I32)), rays=vary_i(jnp.zeros(shape, I32)),
        diffuse=vz(), specular=vz(),
        hitdist=vary_f(jnp.zeros(shape, F32)),
        svis=vary_f(jnp.ones(shape, F32)), spen=vary_f(jnp.zeros(shape, F32)),
        sdist=vary_f(jnp.full(shape, C.NRD_FP16_MAX, F32)),
        phit=jnp.zeros(shape, bool),
        pnormal=tuple(vary_f(c) for c in vconst(shape, 0.0, 1.0, 0.0)),
        prough=vary_f(jnp.ones(shape, F32)),
        palbedo=vz(), pmetal=vary_f(jnp.zeros(shape, F32)),
        ptrans=vary_f(jnp.zeros(shape, F32)), ppos=vz(),
        pobj=vary_i(jnp.full(shape, -1, I32)),
    )


def _primary_cur_k(ks, cfg, xx, yy, bn, vary_i, vary_f):
    """Camera primary-ray state for the tile's pixels."""
    shape = xx.shape
    # ---- primary ray (RayGen.hlsl:107-172) --------------------------------
    if cfg.samples_per_pixel > 1:
        off_x, off_y = bn[0], bn[1]
    else:
        off_x = jnp.full(shape, 0.5, F32)
        off_y = jnp.full(shape, 0.5, F32)
    pcx = xx.astype(F32) + off_x
    pcy = yy.astype(F32) + off_y
    ndc_x = pcx / F32(cfg.width) * 2.0 - 1.0
    ndc_y = -(pcy / F32(cfg.height) * 2.0 - 1.0)
    d = vadd(
        vadd(
            vbroadcast(shape, *ks.cam_fwd),
            vscale(vbroadcast(shape, *ks.cam_right),
                   ndc_x * ks.tanfov * F32(cfg.width / cfg.height)),
        ),
        vscale(vbroadcast(shape, *ks.cam_up), ndc_y * ks.tanfov),
    )
    d = vnorm(d)
    o = vbroadcast(shape, *ks.cam_pos)
    # DoF thin lens (RayGen.hlsl:124-138)
    dof = ks.aperture > 0.001
    focus = vadd(o, vscale(d, ks.focus))
    r = jnp.sqrt(bn[2])
    theta = bn[3] * F32(6.28318530718)
    ox_l = r * jnp.cos(theta) * ks.aperture
    oy_l = r * jnp.sin(theta) * ks.aperture
    o_dof = vadd(o, vadd(vscale(vbroadcast(shape, *ks.cam_right), ox_l),
                         vscale(vbroadcast(shape, *ks.cam_up), oy_l)))
    d_dof = vnorm(vsub(focus, o_dof))
    o = vwhere(dof, o_dof, o)
    d = vwhere(dof, d_dof, d)

    return (
        jnp.ones(shape, bool),  # valid
        o, d,
        vary_i(jnp.zeros(shape, I32)),  # depth
        tuple(vary_f(c) for c in vconst(shape, 1.0, 1.0, 1.0)),  # throughput
        vary_i(jnp.zeros(shape, I32)),  # flags
        vary_f(jnp.ones(shape, F32)),  # sky boost
        vary_i(jnp.zeros(shape, I32)),  # ray flags
        vary_i(jnp.full(shape, _INVALID, I32)),  # skip type
        vary_i(jnp.zeros(shape, I32)),  # skip index
    )


def _stack_init_k(shape, cfg, dirty, dirty_f, slots):
    # Only glass configs ever push to the stack, so only they need the
    # varying-layout init; elsewhere keep the splats so dead stack ops fold.
    if cfg.any_glass:
        stack_f = tuple(
            jnp.zeros((slots, *shape), F32) + dirty_f[None] for _ in range(10)
        )
        stack_i = tuple(
            jnp.zeros((slots, *shape), I32) | dirty[None] for _ in range(5)
        )
    else:
        stack_f = tuple(jnp.zeros((slots, *shape), F32) for _ in range(10))
        stack_i = tuple(jnp.zeros((slots, *shape), I32) for _ in range(5))
    return stack_f, stack_i


def _max_iters(cfg):
    # Epoch scheduling stalls deep lanes, so the same per-lane ray budget
    # can need more tile iterations than the LIFO pop order; the cap is a
    # TDR analog on iterations, not rays, so scale it rather than change
    # which rays fit the budget.
    return cfg.max_queue_iters * (3 if EPOCH_SCHED else 1)


def _run_sample_k(ks, cfg, xx, yy, frame, s, bn, max_iters_override=None,
                  stack_slots=None):
    """One sample's full DFS for the tile; returns (acc, final cur).

    Phase A of the two-phase renderer runs this with max_iters_override=1
    and stack_slots=1: exactly one machine iteration (primary trace + full
    shade + records + spawn decisions), leaving the spawned continuation in
    the returned cur — the coherence-key source for the secondary sort."""
    shape = xx.shape
    dirty, dirty_f, vary_i, vary_f = _dirty_helpers(xx, yy)
    cur = _primary_cur_k(ks, cfg, xx, yy, bn, vary_i, vary_f)
    slots = STACK_DEPTH if stack_slots is None else stack_slots
    stack_f, stack_i = _stack_init_k(shape, cfg, dirty, dirty_f, slots)
    stack_n = vary_i(jnp.zeros(shape, I32))
    acc = _fresh_acc(shape, vary_i, vary_f)
    mi = _max_iters(cfg) if max_iters_override is None else max_iters_override
    final = _dfs_from_k(ks, cfg, xx, yy, frame, s,
                        jnp.int32(0), cur, stack_f, stack_i, stack_n, acc,
                        mi, slots)
    return final[5], final[1]


def _persist_restart(ks, cfg, xx, yy, persist, cur, sn, acc):
    """Per-lane sample restart (persistent-spp scheduling, see _dfs_from_k).

    Lanes whose path tree is exhausted (no current ray, empty stack) and
    that still have samples left start their next sample's primary ray in
    place: the lane sample counter advances, the per-sample blue-noise
    channels are selected by the NEW index, and the running per-sample
    bounce maximum folds into the cross-sample sum."""
    spp = persist["spp"]
    bn_all = persist["bn_all"]
    (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags,
     c_stype, c_sidx) = cur
    s_vec = acc["s_vec"]
    free = (~c_valid) & (sn == 0) & (s_vec < spp - 1)
    new_s = s_vec + free.astype(I32)
    # blue-noise channels of each lane's NEW sample index
    bn = []
    for c in range(4):
        v = bn_all[0][c]
        for si in range(1, spp):
            v = jnp.where(new_s == si, bn_all[si][c], v)
        bn.append(v)
    dirty, dirty_f, vary_i, vary_f = _dirty_helpers(xx, yy)
    prim = _primary_cur_k(ks, cfg, xx, yy, bn, vary_i, vary_f)

    def sel(a, b):
        return jnp.where(free, a, b)

    def sel3(a, b):
        return vwhere(free, a, b)

    cur = (c_valid | free, sel3(prim[1], c_o), sel3(prim[2], c_d),
           sel(prim[3], c_depth), sel3(prim[4], c_tp), sel(prim[5], c_flags),
           sel(prim[6], c_boost), sel(prim[7], c_rflags),
           sel(prim[8], c_stype), sel(prim[9], c_sidx))
    acc = dict(acc)
    acc["bounce_sum"] = acc["bounce_sum"] + jnp.where(free, acc["bounce"].astype(F32), 0.0)
    acc["bounce"] = jnp.where(free, 0, acc["bounce"])
    acc["s_vec"] = new_s
    return cur, acc


def _run_persistent_k(ks, cfg, xx, yy, frame, bn_all):
    """All spp samples in ONE DFS loop with per-lane sample restart.

    The scanned order (fori_loop over samples, each with its own while
    loop) pays every sample's tile tail: the per-iteration packet walks
    (closest + 2 shadow + thickness) run for the whole tile while only
    the slowest lanes still have work. Restarting finished lanes on their
    next sample keeps lane occupancy high, so the same total ray work
    needs fewer iterations — and every iteration saved is one closest
    walk + two shadow walks the tile never pays. Results match the
    scanned order to ~1 ULP summation noise (see _dfs_from_k persist
    notes; interpret-mode equivalence measured 1.9e-6 max)."""
    spp = cfg.samples_per_pixel
    shape = xx.shape
    dirty, dirty_f, vary_i, vary_f = _dirty_helpers(xx, yy)
    cur = _primary_cur_k(ks, cfg, xx, yy, bn_all[0], vary_i, vary_f)
    stack_f, stack_i = _stack_init_k(shape, cfg, dirty, dirty_f, STACK_DEPTH)
    stack_n = vary_i(jnp.zeros(shape, I32))
    acc = _fresh_acc(shape, vary_i, vary_f)
    acc["s_vec"] = vary_i(jnp.zeros(shape, I32))
    acc["bounce_sum"] = vary_f(jnp.zeros(shape, F32))
    final = _dfs_from_k(ks, cfg, xx, yy, frame, jnp.int32(0),
                        jnp.int32(0), cur, stack_f, stack_i, stack_n, acc,
                        _max_iters(cfg) * spp, STACK_DEPTH,
                        persist=dict(spp=spp, bn_all=bn_all))
    return final[5]


def _finalize_persistent(accs, a):
    """Fold the persistent run's accumulator dict into the per-tile channel
    tuple — _merge_sample's cross-sample semantics, already realized
    per lane: sums are complete, the shadow records are sample 0's, and
    the bounce total is the per-sample-maxima sum."""
    return (
        vadd(accs[0], a["color"]),
        vadd(accs[1], a["primary"]),
        vadd(accs[2], a["diffuse"]),
        vadd(accs[3], a["specular"]),
        accs[4] + a["hitdist"],
        accs[5] + a["bounce_sum"] + a["bounce"].astype(F32),
        accs[6] + a["rays"].astype(F32),
        a["svis"], a["spen"], a["sdist"],
        vwhere(a["phit"], a["pnormal"], accs[10]),
        jnp.where(a["phit"], a["prough"], accs[11]),
        vwhere(a["phit"], a["palbedo"], accs[12]),
        jnp.where(a["phit"], a["pmetal"], accs[13]),
        jnp.where(a["phit"], a["ptrans"], accs[14]),
        vwhere(a["phit"], a["ppos"], accs[15]),
        accs[16] | a["phit"].astype(I32),
        jnp.where(a["phit"], a["pobj"], accs[17]),
    )


def _dfs_from_k(ks, cfg, xx, yy, frame, s, it0, cur, stack_f, stack_i, stack_n,
                acc, max_iters, stack_slots, persist=None):
    """The DFS state machine, resumable from any (iteration, cur, stack, acc).

    `stack_slots` sizes the stack STORAGE arrays; the push-capacity checks
    always use STACK_DEPTH (the reference's WORK_QUEUE_STRIDE budget,
    RayGen.hlsl:697-846) so a storage-truncated run (phase A of the
    two-phase renderer, which executes exactly one iteration and can hold
    at most one entry) makes identical spawn/overflow decisions to the
    full-depth machine. Returns the final flat state unflattened:
    (it, cur, stack_f, stack_i, stack_n, acc).

    persist = dict(spp=int, bn_all=[spp][4] blue-noise tiles): PER-LANE
    sample scheduling. Instead of an outer spp scan whose every sample
    pays the tile's slowest lane (the per-sample tail leaves most lanes
    idle while the packet walks still run), a lane that exhausts its
    sample's path tree immediately restarts on its next sample's primary
    ray. The per-sample math is UNCHANGED — seeds key on (pixel, lane
    sample index, depth) and the blue-noise channels are selected per
    lane — so results match the scanned order to float summation order
    (~1 ULP on the accumulated sums; ray counts exact); only the
    iteration count (and with it the number of packet walks) drops.
    `s` is ignored in this mode (the lane sample index lives in the
    carry); acc["svis"/"spen"/"sdist"] record sample 0 only, matching
    _merge_sample's s==0 selection, and acc["bounce"] accumulates the
    per-sample maxima via a running (bounce_sum, bounce_run) pair.
    """
    spp_p = persist["spp"] if persist else 0
    # NOTE: boolean masks are carried as i32 — i1 vectors in Mosaic loop
    # carries hit "invalid relayout" errors on TPU.
    def flatten_state(it, cur, sf, si, sn, acc):
        base = (it, cur[0].astype(I32), *cur[1], *cur[2], cur[3], *cur[4], cur[5], cur[6],
                cur[7], cur[8], cur[9], *sf, *si, sn,
                *acc["color"], *acc["primary"], acc["bounce"], acc["rays"],
                *acc["diffuse"], *acc["specular"], acc["hitdist"],
                acc["svis"], acc["spen"], acc["sdist"], acc["phit"].astype(I32),
                *acc["pnormal"], acc["prough"], *acc["palbedo"], acc["pmetal"],
                acc["ptrans"], *acc["ppos"], acc["pobj"])
        if persist:
            base = base + (acc["s_vec"], acc["bounce_sum"])
        return base

    def unflatten_state(t):
        it = t[0]
        cur = (t[1] != 0, (t[2], t[3], t[4]), (t[5], t[6], t[7]), t[8],
               (t[9], t[10], t[11]), t[12], t[13], t[14], t[15], t[16])
        k = 17
        sf = tuple(t[k + i] for i in range(10)); k += 10
        si = tuple(t[k + i] for i in range(5)); k += 5
        sn = t[k]; k += 1
        acc = dict(
            color=(t[k], t[k+1], t[k+2]), primary=(t[k+3], t[k+4], t[k+5]),
            bounce=t[k+6], rays=t[k+7],
            diffuse=(t[k+8], t[k+9], t[k+10]), specular=(t[k+11], t[k+12], t[k+13]),
            hitdist=t[k+14], svis=t[k+15], spen=t[k+16], sdist=t[k+17],
            phit=t[k+18] != 0,
            pnormal=(t[k+19], t[k+20], t[k+21]), prough=t[k+22],
            palbedo=(t[k+23], t[k+24], t[k+25]), pmetal=t[k+26], ptrans=t[k+27],
            ppos=(t[k+28], t[k+29], t[k+30]), pobj=t[k+31],
        )
        if persist:
            acc["s_vec"] = t[k + 32]
            acc["bounce_sum"] = t[k + 33]
        return it, cur, sf, si, sn, acc

    def cond(t):
        it, cur, sf, si, sn, acc = unflatten_state(t)
        live = cur[0] | (sn > 0)
        if persist:
            live = live | (acc["s_vec"] < spp_p - 1)
        return (it < max_iters) & jnp.any(live)

    def body(t):
        it, cur, sf, si, sn, acc = unflatten_state(t)
        if persist:
            cur, acc = _persist_restart(ks, cfg, xx, yy, persist, cur, sn, acc)
        (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags,
         c_stype, c_sidx) = cur
        active = c_valid
        if EPOCH_SCHED:
            # Trace only the minimum-depth lanes this iteration; deeper
            # lanes stall so every packet walk sees one bounce generation.
            epoch = jnp.min(jnp.where(active, c_depth, jnp.int32(1 << 30)))
            process = active & (c_depth == epoch)
        else:
            process = active
        stalled = active & ~process
        bounce = jnp.maximum(acc["bounce"], jnp.where(process, c_depth + 1, 0))

        capped = process & (c_depth >= cfg.max_bounces)
        sky_nb = sky_color3(c_d)
        cap_c = vmul(c_tp, sky_nb)
        color_acc = vadd(acc["color"], vwhere(capped, cap_c, vzeros(c_depth.shape)))
        prim_acc = vadd(
            acc["primary"],
            vwhere(capped & (c_depth == 0), cap_c, vzeros(c_depth.shape)),
        )

        killed = (
            process & ~capped
            & (vmax3(c_tp) < C.THROUGHPUT_THRESHOLD)
            & ((c_flags & C.PATH_FLAG_SPECULAR) == 0)
        )
        traced = process & ~capped & ~killed
        rays = acc["rays"] + traced.astype(I32)

        s_use = acc["s_vec"] if persist else s
        color, rec, ch, extra = _shade_and_spawn_k(ks, cfg, xx, yy, frame,
                                                   s_use, cur, traced)
        rays = rays + jnp.where(traced, extra, 0)
        if ch["stat"] is not None:
            # RTVS_MK_STATS analysis mode: the rays channel carries BVH
            # visit counts broadcast to every lane (divide sums by the
            # tile size to recover walk totals).
            rays = rays + ch["stat"]
        if _STATS == "iters":
            # Occupancy analysis: every executed machine iteration adds 1
            # to every lane, so sum(rays)/(TILE_H*TILE_W) = total tile
            # iterations and real-rays / (iters * 4096) = mean fraction
            # of lanes doing work per iteration.
            rays = rays + 1

        contrib = vmul(c_tp, color)
        color_acc = vadd(color_acc, vwhere(traced, contrib, vzeros(c_depth.shape)))
        prim_acc = vadd(prim_acc,
                        vwhere(traced & (c_depth == 0), contrib, vzeros(c_depth.shape)))

        rec_now = traced & (c_depth == 0)
        zz = vzeros(c_depth.shape)
        diffuse = vadd(acc["diffuse"], vwhere(rec_now, rec["diffuse"], zz))
        specular = vadd(acc["specular"], vwhere(rec_now, rec["specular"], zz))
        hitdist = acc["hitdist"] + jnp.where(rec_now, rec["hit_distance"], 0.0)
        # Raw shadow data records sample 0 only — the per-lane equivalent
        # of _merge_sample's s == 0 selection in the scanned order.
        rec_sh = rec_now & (acc["s_vec"] == 0) if persist else rec_now
        svis = jnp.where(rec_sh, rec["shadow_vis"], acc["svis"])
        spen = jnp.where(rec_sh, rec["shadow_pen"], acc["spen"])
        sdist = jnp.where(rec_sh, rec["shadow_dist"], acc["sdist"])
        first_hit = rec_now & rec["hit_mask"] & ~acc["phit"]
        pnormal = vwhere(first_hit, rec["normal"], acc["pnormal"])
        prough = jnp.where(first_hit, rec["roughness"], acc["prough"])
        palbedo = vwhere(first_hit, rec["albedo"], acc["palbedo"])
        pmetal = jnp.where(first_hit, rec["metallic"], acc["pmetal"])
        ptrans = jnp.where(first_hit, rec["transmission"], acc["ptrans"])
        ppos = vwhere(first_hit, rec["position"], acc["ppos"])
        pobj = jnp.where(first_hit, rec["obj_id"], acc["pobj"])
        phit = acc["phit"] | first_hit

        cur_next, sf, si, sn = _advance_state_k(
            cur, ch, traced, stalled, sf, si, sn, stack_slots
        )
        acc_next = dict(
            color=color_acc, primary=prim_acc, bounce=bounce, rays=rays,
            diffuse=diffuse, specular=specular, hitdist=hitdist,
            svis=svis, spen=spen, sdist=sdist, phit=phit,
            pnormal=pnormal, prough=prough, palbedo=palbedo, pmetal=pmetal,
            ptrans=ptrans, ppos=ppos, pobj=pobj,
        )
        if persist:
            acc_next["s_vec"] = acc["s_vec"]
            acc_next["bounce_sum"] = acc["bounce_sum"]
        return flatten_state(it + 1, cur_next, sf, si, sn, acc_next)

    init = flatten_state(it0, cur, stack_f, stack_i, stack_n, acc)
    if "fori" in _DEBUG_DISABLE:
        final = jax.lax.fori_loop(
            0, max_iters, lambda _i, t: body(t), init
        )
    else:
        final = jax.lax.while_loop(cond, body, init)
    return unflatten_state(final)


def _advance_state_k(cur, ch, traced, stalled, sf, si, sn, stack_slots):
    """One step of the continuation/stack machine (RayGen.hlsl:697-846),
    shared by the DFS body and the two-phase phase-B prologue. The push
    CAPACITY checks use STACK_DEPTH (the reference's WORK_QUEUE_STRIDE)
    regardless of how many storage slots the caller materialized."""
    (c_valid, c_o, c_d, c_depth, c_tp, c_flags, c_boost, c_rflags,
     c_stype, c_sidx) = cur
    glass_spawn = ch["glass_spawn"] & traced
    if "gspawn" in _DEBUG_DISABLE:  # perf bisect: no glass children
        glass_spawn = glass_spawn & (c_depth < 0)
    metal_spawn = ch["metal_spawn"] & traced
    tir = ch["tir"]
    push_reflect = glass_spawn & (sn < STACK_DEPTH)
    qc_after = sn + push_reflect.astype(I32)
    refract_ok = glass_spawn & ~tir & (qc_after < STACK_DEPTH)
    stack_write = push_reflect & refract_ok

    next_depth = c_depth + 1
    spec_flags = c_flags | C.PATH_FLAG_SPECULAR
    r_origin = vadd(ch["hit_pos"], vscale(ch["normal"], F32(C.SELF_OFFSET)))
    reflect_f = (*r_origin, *ch["reflect_dir"], *ch["reflect_tp"],
                 jnp.full(c_depth.shape, C.SKY_BOOST_GLASS, F32))
    reflect_i = (next_depth, spec_flags,
                 jnp.full(c_depth.shape, C.RAYFLAG_SKIP_SELF, I32),
                 ch["hit_type"], ch["hit_index"])

    # push reflect where stack_write: one-hot select along the slot axis
    # (pure elementwise — no scatter, VMEM-resident)
    slot_ids = jax.lax.broadcasted_iota(I32, (stack_slots,) + sn.shape, 0)
    push_mask = (slot_ids == sn[None]) & stack_write[None]
    sf = tuple(
        jnp.where(push_mask, reflect_f[fi][None], field) for fi, field in enumerate(sf)
    )
    si = tuple(
        jnp.where(push_mask, reflect_i[fi][None], field) for fi, field in enumerate(si)
    )
    sn = sn + stack_write.astype(I32)

    refract_flags = jnp.where(
        ch["entering"], spec_flags | C.PATH_FLAG_INSIDE,
        spec_flags & ~jnp.int32(C.PATH_FLAG_INSIDE),
    )
    rr_origin = vadd(ch["hit_pos"], vscale(ch["refract_dir"], F32(C.SELF_OFFSET)))
    metal_inside = (spec_flags & C.PATH_FLAG_INSIDE) != 0

    cont_refract = refract_ok
    cont_reflect = push_reflect & ~refract_ok
    cont_metal = metal_spawn
    has_cont = cont_refract | cont_reflect | cont_metal

    def pick(metal_v, reflect_v, refract_v, default):
        v = jnp.where(cont_metal, metal_v, default)
        v = jnp.where(cont_reflect, reflect_v, v)
        v = jnp.where(cont_refract, refract_v, v)
        return v

    def pick3(metal_v, reflect_v, refract_v, default):
        return tuple(
            pick(metal_v[i], reflect_v[i], refract_v[i], default[i]) for i in range(3)
        )

    m_origin = r_origin
    zero3t = vzeros(c_depth.shape)
    cont_o = pick3(m_origin, r_origin, rr_origin, zero3t)
    cont_d = pick3(ch["metal_dir"], ch["reflect_dir"], ch["refract_dir"],
                   vconst(c_depth.shape, 0.0, 0.0, 1.0))
    cont_tp = pick3(ch["metal_tp"], ch["reflect_tp"], ch["refract_tp"], zero3t)
    cont_depth = jnp.where(has_cont, next_depth, 0)
    cont_flags = pick(spec_flags, spec_flags, refract_flags, jnp.zeros(c_depth.shape, I32))
    cont_boost = pick(jnp.full(c_depth.shape, C.SKY_BOOST_METAL, F32),
                      jnp.full(c_depth.shape, C.SKY_BOOST_GLASS, F32),
                      jnp.full(c_depth.shape, C.SKY_BOOST_GLASS, F32),
                      jnp.ones(c_depth.shape, F32))
    cont_rflags = pick(jnp.where(metal_inside, 0, C.RAYFLAG_SKIP_SELF).astype(I32),
                       jnp.full(c_depth.shape, C.RAYFLAG_SKIP_SELF, I32),
                       # refract child: pending-thickness tag (instance+1
                       # in bits 8+, see _spawn_children_k / _hit_context_k)
                       ch["thick_tag"],
                       jnp.zeros(c_depth.shape, I32))
    cont_stype = pick(jnp.where(metal_inside, _INVALID, ch["hit_type"]),
                      ch["hit_type"],
                      jnp.full(c_depth.shape, _INVALID, I32),
                      jnp.full(c_depth.shape, _INVALID, I32))
    cont_sidx = pick(jnp.where(metal_inside, 0, ch["hit_index"]),
                     ch["hit_index"], jnp.zeros(c_depth.shape, I32),
                     jnp.zeros(c_depth.shape, I32))

    # pop for terminal lanes (stalled lanes keep their pending ray)
    do_pop = ~has_cont & (sn > 0) & ~stalled
    pop_slot = jnp.clip(sn - 1, 0, stack_slots - 1)
    popped_f = [jnp.zeros(c_depth.shape, F32) for _ in range(10)]
    popped_i = [jnp.zeros(c_depth.shape, I32) for _ in range(5)]
    for slot in range(stack_slots):
        m = do_pop & (pop_slot == slot)
        for fi in range(10):
            popped_f[fi] = jnp.where(m, sf[fi][slot], popped_f[fi])
        for fi in range(5):
            popped_i[fi] = jnp.where(m, si[fi][slot], popped_i[fi])
    sn = sn - do_pop.astype(I32)

    nxt_valid = has_cont | do_pop | stalled

    def merge(cont_v, pop_v, cur_v):
        nv = jnp.where(do_pop, pop_v, cont_v)
        # stalled lanes carry their current ray through unchanged
        return jnp.where(stalled, cur_v, nv)

    cur_next = (
        nxt_valid,
        (merge(cont_o[0], popped_f[0], c_o[0]),
         merge(cont_o[1], popped_f[1], c_o[1]),
         merge(cont_o[2], popped_f[2], c_o[2])),
        (merge(cont_d[0], popped_f[3], c_d[0]),
         merge(cont_d[1], popped_f[4], c_d[1]),
         merge(cont_d[2], popped_f[5], c_d[2])),
        merge(cont_depth, popped_i[0], c_depth),
        (merge(cont_tp[0], popped_f[6], c_tp[0]),
         merge(cont_tp[1], popped_f[7], c_tp[1]),
         merge(cont_tp[2], popped_f[8], c_tp[2])),
        merge(cont_flags, popped_i[1], c_flags),
        merge(cont_boost, popped_f[9], c_boost),
        merge(cont_rflags, popped_i[2], c_rflags),
        merge(cont_stype, popped_i[3], c_stype),
        merge(cont_sidx, popped_i[4], c_sidx),
    )
    return cur_next, sf, si, sn


def _merge_sample(accs, a, s):
    """Fold one sample's accumulator dict into the per-tile channel tuple."""
    return (
        vadd(accs[0], a["color"]),
        vadd(accs[1], a["primary"]),
        vadd(accs[2], a["diffuse"]),
        vadd(accs[3], a["specular"]),
        accs[4] + a["hitdist"],
        accs[5] + a["bounce"].astype(F32),
        accs[6] + a["rays"].astype(F32),
        jnp.where(s == 0, a["svis"], accs[7]),
        jnp.where(s == 0, a["spen"], accs[8]),
        jnp.where(s == 0, a["sdist"], accs[9]),
        # first-hit records across samples (anyHit, RayGen.hlsl:575-587)
        vwhere(a["phit"] & (accs[16] == 0), a["pnormal"], accs[10]),
        jnp.where(a["phit"] & (accs[16] == 0), a["prough"], accs[11]),
        vwhere(a["phit"] & (accs[16] == 0), a["palbedo"], accs[12]),
        jnp.where(a["phit"] & (accs[16] == 0), a["pmetal"], accs[13]),
        jnp.where(a["phit"] & (accs[16] == 0), a["ptrans"], accs[14]),
        vwhere(a["phit"] & (accs[16] == 0), a["ppos"], accs[15]),
        accs[16] | a["phit"].astype(I32),
        jnp.where(a["phit"] & (accs[16] == 0), a["pobj"], accs[17]),
    )


def _bind_ks(caps, sph_ref, pln_ref, box_ref, mat_ref, lts_ref, fp_ref, ip_ref,
             mesh_refs, mesh_scratch=None):
    """Bind scene-table refs + scalar params into the kernel-side KScene."""
    s_cap, p_cap, b_cap, l_cap = caps[:4]

    class _KS:
        pass

    kk = _KS()
    kk.sph, kk.pln, kk.box, kk.mat, kk.lts = sph_ref, pln_ref, box_ref, mat_ref, lts_ref
    kk.s_cap, kk.p_cap, kk.b_cap, kk.l_cap = s_cap, p_cap, b_cap, l_cap
    kk.atten_c = fp_ref[0, FP_ATTEN_C]
    kk.atten_l = fp_ref[0, FP_ATTEN_L]
    kk.atten_q = fp_ref[0, FP_ATTEN_Q]
    kk.num_lights = ip_ref[0, IP_NUM_LIGHTS]
    kk.max_shadow_lights = ip_ref[0, IP_MAX_SHADOW_LIGHTS]
    kk.shadow_strength = fp_ref[0, FP_SHADOW_STRENGTH]
    kk.absorb_scale = fp_ref[0, FP_ABSORB_SCALE]
    kk.cam_pos = (fp_ref[0, FP_CAMPOS], fp_ref[0, FP_CAMPOS + 1], fp_ref[0, FP_CAMPOS + 2])
    kk.cam_fwd = (fp_ref[0, FP_FWD], fp_ref[0, FP_FWD + 1], fp_ref[0, FP_FWD + 2])
    kk.cam_right = (fp_ref[0, FP_RIGHT], fp_ref[0, FP_RIGHT + 1], fp_ref[0, FP_RIGHT + 2])
    kk.cam_up = (fp_ref[0, FP_UP], fp_ref[0, FP_UP + 1], fp_ref[0, FP_UP + 2])
    kk.tanfov = fp_ref[0, FP_TANFOV]
    kk.aperture = fp_ref[0, FP_APERTURE]
    kk.focus = fp_ref[0, FP_FOCUS]
    kk.i_cap = 0
    kk.mesh = None
    if mesh_refs is not None:
        num_nodes, num_tris, leaf_size, num_inst = caps[4:]
        kk.mesh = KMesh(mesh_refs[0], mesh_refs[1], mesh_refs[2], mesh_refs[3],
                        num_nodes, num_tris, leaf_size, num_inst,
                        hbm_scratch=mesh_scratch)
        kk.i_cap = num_inst
    return kk


def make_kernel(cfg: RenderConfig, caps, phase_a: bool = False,
                mesh_hbm: bool = False):
    """Build the tile kernel for static (config, table capacities).

    caps = (s, p, b, l) for analytic-only scenes, or
    (s, p, b, l, num_nodes, num_tris, leaf_size, num_inst) with a mesh —
    the mesh variant takes five extra table refs.

    mesh_hbm=True: the two triangle tables stay HBM-resident and arrive as
    ANY-space refs; three trailing scratch args (two [16,128] VMEM leaf
    windows + a DMA semaphore pair) stream leaves on demand. Removes the
    VMEM mesh-size cap entirely (the reference's driver BLAS has none,
    AccelerationStructure.cpp:560-663).

    phase_a=True (two-phase renderer, spp==1 only): the DFS runs exactly
    ONE machine iteration — primary trace, full shade, records, spawn
    decisions — and the spawned continuation (valid, origin, direction) is
    written to 7 extra channels for the XLA-side coherence sort.
    """
    s_cap, p_cap, b_cap, l_cap = caps[:4]
    has_mesh = len(caps) > 4
    assert not (mesh_hbm and not has_mesh)
    if phase_a:
        assert cfg.samples_per_pixel == 1, "two-phase requires spp == 1"

    def kernel(sph_ref, pln_ref, box_ref, mat_ref, lts_ref, fp_ref, ip_ref, bn_ref,
               *rest):
        if mesh_hbm:
            out_ref = rest[-4]
            mesh_scratch = (rest[-3], rest[-2], rest[-1])
        else:
            out_ref = rest[-1]
            mesh_scratch = None
        shape = (TILE_H, TILE_W)
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        row0 = ip_ref[0, IP_ROW_START] + ti * TILE_H
        col0 = tj * TILE_W
        yy = row0 + jax.lax.broadcasted_iota(I32, shape, 0)
        xx = col0 + jax.lax.broadcasted_iota(I32, shape, 1)
        frame = ip_ref[0, IP_FRAME]
        kk = _bind_ks(caps, sph_ref, pln_ref, box_ref, mat_ref, lts_ref,
                      fp_ref, ip_ref, rest[:4] if has_mesh else None,
                      mesh_scratch=mesh_scratch)

        def sample_body(s, accs):
            bn = _blue_noise_tile_channels(bn_ref, frame, s, row0)
            a, _cur = _run_sample_k(kk, cfg, xx, yy, frame, s, bn)
            return _merge_sample(accs, a, s)

        use_persist = (PERSIST_SPP and cfg.samples_per_pixel > 1
                       and not phase_a)

        init = (
            vzeros(shape), vzeros(shape), vzeros(shape), vzeros(shape),
            jnp.zeros(shape, F32), jnp.zeros(shape, F32), jnp.zeros(shape, F32),
            jnp.ones(shape, F32), jnp.zeros(shape, F32),
            jnp.full(shape, C.NRD_FP16_MAX, F32),
            vconst(shape, 0.0, 1.0, 0.0), jnp.ones(shape, F32), vzeros(shape),
            jnp.zeros(shape, F32), jnp.zeros(shape, F32), vzeros(shape),
            jnp.zeros(shape, I32),
            jnp.full(shape, -1, I32),
        )
        if phase_a:
            s0 = jnp.int32(0)
            bn = _blue_noise_tile_channels(bn_ref, frame, s0, row0)
            a, cur1 = _run_sample_k(kk, cfg, xx, yy, frame, s0, bn,
                                    max_iters_override=1, stack_slots=1)
            accs = _merge_sample(init, a, s0)
        elif use_persist:
            bn_all = [
                _blue_noise_tile_channels(bn_ref, frame, jnp.int32(si), row0)
                for si in range(cfg.samples_per_pixel)
            ]
            a = _run_persistent_k(kk, cfg, xx, yy, frame, bn_all)
            accs = _finalize_persistent(init, a)
        else:
            accs = jax.lax.fori_loop(0, cfg.samples_per_pixel, sample_body, init)
        (color, primary, diffuse, specular, hitdist, bounce, rays,
         svis, spen, sdist, pnormal, prough, palbedo, pmetal, ptrans, ppos, phit,
         pobj) = accs

        out_ref[CH_COLOR, :, :] = color[0]
        out_ref[CH_COLOR + 1, :, :] = color[1]
        out_ref[CH_COLOR + 2, :, :] = color[2]
        out_ref[CH_PRIMARY, :, :] = primary[0]
        out_ref[CH_PRIMARY + 1, :, :] = primary[1]
        out_ref[CH_PRIMARY + 2, :, :] = primary[2]
        out_ref[CH_DIFFUSE, :, :] = diffuse[0]
        out_ref[CH_DIFFUSE + 1, :, :] = diffuse[1]
        out_ref[CH_DIFFUSE + 2, :, :] = diffuse[2]
        out_ref[CH_SPECULAR, :, :] = specular[0]
        out_ref[CH_SPECULAR + 1, :, :] = specular[1]
        out_ref[CH_SPECULAR + 2, :, :] = specular[2]
        out_ref[CH_HITDIST, :, :] = hitdist
        out_ref[CH_BOUNCE, :, :] = bounce
        out_ref[CH_RAYS, :, :] = rays
        out_ref[CH_PRIM_HIT, :, :] = phit.astype(F32)
        out_ref[CH_NORMAL, :, :] = pnormal[0]
        out_ref[CH_NORMAL + 1, :, :] = pnormal[1]
        out_ref[CH_NORMAL + 2, :, :] = pnormal[2]
        out_ref[CH_ROUGH, :, :] = prough
        out_ref[CH_ALBEDO, :, :] = palbedo[0]
        out_ref[CH_ALBEDO + 1, :, :] = palbedo[1]
        out_ref[CH_ALBEDO + 2, :, :] = palbedo[2]
        out_ref[CH_METALLIC, :, :] = pmetal
        out_ref[CH_TRANSMISSION, :, :] = ptrans
        out_ref[CH_POS, :, :] = ppos[0]
        out_ref[CH_POS + 1, :, :] = ppos[1]
        out_ref[CH_POS + 2, :, :] = ppos[2]
        out_ref[CH_SHADOW_VIS, :, :] = svis
        out_ref[CH_SHADOW_PEN, :, :] = spen
        out_ref[CH_SHADOW_DIST, :, :] = sdist
        out_ref[CH_OBJ_ID, :, :] = pobj.astype(F32)
        if phase_a:
            out_ref[CH_SPAWN_VALID, :, :] = cur1[0].astype(F32)
            out_ref[CH_SPAWN_O, :, :] = cur1[1][0]
            out_ref[CH_SPAWN_O + 1, :, :] = cur1[1][1]
            out_ref[CH_SPAWN_O + 2, :, :] = cur1[1][2]
            out_ref[CH_SPAWN_D, :, :] = cur1[2][0]
            out_ref[CH_SPAWN_D + 1, :, :] = cur1[2][1]
            out_ref[CH_SPAWN_D + 2, :, :] = cur1[2][2]

    return kernel


def make_kernel_b(cfg: RenderConfig, caps):
    """Phase-B tile kernel: resume sorted continuations (two-phase renderer).

    Lanes are PIXELS in coherence-sorted order (xx/yy/vmask inputs), not
    screen tiles. The prologue re-derives the pixel's post-primary machine
    state bit-exactly (same camera ray, intersection, RNG and spawn math as
    phase A's single iteration — _children_only_k skips only the radiance
    work that phase A already recorded), then the shared DFS resumes from
    iteration 1 with the full stack. Output: the subtree's color
    contribution + ray/bounce counters, in sorted-lane order.
    """
    has_mesh = len(caps) > 4
    assert cfg.samples_per_pixel == 1, "two-phase requires spp == 1"

    def kernel(xx_ref, yy_ref, vm_ref, sph_ref, pln_ref, box_ref, mat_ref,
               lts_ref, fp_ref, ip_ref, bn_ref, *rest):
        out_ref = rest[-1]
        shape = (TILE_H, TILE_W)
        kk = _bind_ks(caps, sph_ref, pln_ref, box_ref, mat_ref, lts_ref,
                      fp_ref, ip_ref, rest[:4] if has_mesh else None)
        frame = ip_ref[0, IP_FRAME]
        xx = xx_ref[...]
        yy = yy_ref[...]
        vm = vm_ref[...] != 0

        for c in range(NUM_CH_B):
            out_ref[c, :, :] = jnp.zeros(shape, F32)

        # Sorted order puts spawn-less pixels (and padding) in a contiguous
        # tail, so whole tail tiles skip the prologue and the DFS entirely.
        @pl.when(jnp.any(vm))
        def _tile():
            s0 = jnp.int32(0)
            dirty, dirty_f, vary_i, vary_f = _dirty_helpers(xx, yy)
            # Two-phase is gated to aperture==0 scenes (engine._pick_backend),
            # so the DoF blue-noise channels are never consulted: zeros keep
            # the (dynamically dead) thin-lens math finite.
            bn0 = (jnp.full(shape, 0.5, F32), jnp.full(shape, 0.5, F32),
                   jnp.zeros(shape, F32), jnp.zeros(shape, F32))
            cur0 = _primary_cur_k(kk, cfg, xx, yy, bn0, vary_i, vary_f)
            cur0 = (vm,) + cur0[1:]
            # Iteration-0 budget logic for fresh primaries: never capped
            # (max_bounces >= 1), never killed (throughput 1, no flags).
            traced = vm
            ch, _extra = _children_only_k(kk, cfg, xx, yy, frame, s0, cur0, traced)
            stalled = jnp.zeros(shape, bool)
            sf, si = _stack_init_k(shape, cfg, dirty, dirty_f, STACK_DEPTH)
            sn0 = vary_i(jnp.zeros(shape, I32))
            cur1, sf, si, sn = _advance_state_k(
                cur0, ch, traced, stalled, sf, si, sn0, STACK_DEPTH
            )
            acc = _fresh_acc(shape, vary_i, vary_f)
            final = _dfs_from_k(kk, cfg, xx, yy, frame, s0, jnp.int32(1),
                                cur1, sf, si, sn, acc, _max_iters(cfg),
                                STACK_DEPTH)
            acc = final[5]
            out_ref[CHB_COLOR, :, :] = acc["color"][0]
            out_ref[CHB_COLOR + 1, :, :] = acc["color"][1]
            out_ref[CHB_COLOR + 2, :, :] = acc["color"][2]
            out_ref[CHB_RAYS, :, :] = acc["rays"].astype(F32)
            out_ref[CHB_BOUNCE, :, :] = acc["bounce"].astype(F32)

    return kernel


def _cdiv(a, b):
    return -(-a // b)


def _pack_args(scene: FlatScene, cfg: RenderConfig, row_start):
    """Scene tables + static capacities for a megakernel launch."""
    pack = pack_scene(scene, row_start)
    caps = (scene.sphere_capacity, scene.plane_capacity, scene.box_capacity,
            scene.light_capacity)
    args = [pack.sph, pack.pln, pack.box, pack.mat, pack.lts, pack.fparams,
            pack.iparams, pack.bnoise]
    if scene.mesh is not None:
        from .. import bvh as bvh_mod

        mesh = scene.mesh
        caps = caps + (mesh.mk_num_nodes, mesh.mk_num_tris, bvh_mod.MK_LEAF_SIZE,
                       mesh.inst_transmission.shape[0])
        args += list(pack_mesh(
            mesh, F32(C.SHADOW_ABSORPTION_THICKNESS) * scene.shadow_absorption_scale
        ))
    return args, caps


def _accum_dict(out, num_rows, width):
    """Flatten the NUM_CH-channel tile output to the accumulator contract."""
    out = out[:, :num_rows, :width]
    n = num_rows * width

    def ch(i):
        return out[i].reshape(n)

    def ch3(i):
        return jnp.stack([ch(i), ch(i + 1), ch(i + 2)], axis=-1)

    return dict(
        color=ch3(CH_COLOR),
        primary=ch3(CH_PRIMARY),
        diffuse=ch3(CH_DIFFUSE),
        specular=ch3(CH_SPECULAR),
        hitdist=ch(CH_HITDIST),
        bounce=ch(CH_BOUNCE),
        rays=jnp.sum(out[CH_RAYS]),
        prim_hit=ch(CH_PRIM_HIT) > 0.5,
        prim_normal=ch3(CH_NORMAL),
        prim_rough=ch(CH_ROUGH),
        prim_albedo=ch3(CH_ALBEDO),
        prim_metallic=ch(CH_METALLIC),
        prim_transmission=ch(CH_TRANSMISSION),
        prim_pos=ch3(CH_POS),
        shadow_vis=ch(CH_SHADOW_VIS),
        shadow_pen=ch(CH_SHADOW_PEN),
        shadow_dist=ch(CH_SHADOW_DIST),
        obj_id=ch(CH_OBJ_ID).astype(jnp.int32),
    )


def _launch_megakernel(scene: FlatScene, cfg: RenderConfig, row_start,
                       num_rows: int, interpret: bool, mesh_hbm: bool):
    """The ONE megakernel launch: [NUM_CH, grid_h*32, grid_w*128] planes.

    Shared by the lane (_accum_dict) and channel-first (_accum_dict_cf)
    views so table specs / HBM ANY-spec indices / scratch shapes cannot
    drift between the two pipelines.

    mesh_hbm=True keeps the triangle tables in HBM and streams leaves via
    per-visit DMA (see make_kernel) — the no-size-cap path for meshes whose
    dense tables exceed the VMEM budget.
    """
    args, caps = _pack_args(scene, cfg, row_start)
    grid_h = _cdiv(num_rows, TILE_H)
    grid_w = _cdiv(cfg.width, TILE_W)
    mesh_hbm = mesh_hbm and len(caps) > 4

    def table_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [table_spec(a) for a in args]
    scratch_shapes = []
    if mesh_hbm:
        # args layout: 8 scene tables + [nodes_fi, tri_geo, tri_extra,
        # inst_tbl]; the tri tables become whole-array HBM refs the kernel
        # DMAs per leaf visit
        in_specs[9] = pl.BlockSpec(memory_space=pl.ANY)
        in_specs[10] = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = [
            pltpu.VMEM((16, 128), F32),
            pltpu.VMEM((16, 128), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    return pl.pallas_call(
        make_kernel(cfg, caps, mesh_hbm=mesh_hbm),
        out_shape=jax.ShapeDtypeStruct((NUM_CH, grid_h * TILE_H, grid_w * TILE_W), F32),
        grid=(grid_h, grid_w),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (NUM_CH, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)


def render_accum_pallas(scene: FlatScene, cfg: RenderConfig, row_start, num_rows: int,
                        interpret: bool = False, mesh_hbm: bool = False):
    """Run the megakernel over the row slab; returns the 17 accumulators.

    Output arrays are flattened to [num_rows*width] lanes to match the jnp
    wavefront's accumulator contract (ops/render.py).
    """
    out = _launch_megakernel(scene, cfg, row_start, num_rows, interpret, mesh_hbm)
    return _accum_dict(out, num_rows, cfg.width)


def render_accum_pallas_cf(scene: FlatScene, cfg: RenderConfig, row_start,
                           num_rows: int, interpret: bool = False,
                           mesh_hbm: bool = False):
    """Channel-first accumulators: same megakernel launch as
    render_accum_pallas, but the [NUM_CH, H, W] tile output is exposed as
    channel PLANES (3-vectors as contiguous [3,H,W] slices) instead of
    being interleaved into [N,c] lane stacks.

    The lane stacks + the [N,c]->[c,H,W] transposes the denoiser then
    undoes measured ~23 ms of pure layout churn at 4K (scripts/
    probe_4k_denoise_sub.py) — the kernel's native output is already
    channel-first, so the fast pipeline (ops/render_cf.py) keeps it that
    way end to end."""
    out = _launch_megakernel(scene, cfg, row_start, num_rows, interpret, mesh_hbm)
    return _accum_dict_cf(out, num_rows, cfg.width)


def _accum_dict_cf(out, num_rows, width):
    """Channel-first view of the NUM_CH-channel tile output: [H,W] planes
    and contiguous [3,H,W] vector slices — pure slicing, no interleave."""
    out = out[:, :num_rows, :width]

    def ch(i):
        return out[i]

    def ch3(i):
        return out[i:i + 3]

    return dict(
        color=ch3(CH_COLOR),
        primary=ch3(CH_PRIMARY),
        diffuse=ch3(CH_DIFFUSE),
        specular=ch3(CH_SPECULAR),
        hitdist=ch(CH_HITDIST),
        bounce=ch(CH_BOUNCE),
        rays=jnp.sum(out[CH_RAYS]),
        prim_hit=ch(CH_PRIM_HIT) > 0.5,
        prim_normal=ch3(CH_NORMAL),
        prim_rough=ch(CH_ROUGH),
        prim_albedo=ch3(CH_ALBEDO),
        prim_metallic=ch(CH_METALLIC),
        prim_transmission=ch(CH_TRANSMISSION),
        prim_pos=ch3(CH_POS),
        shadow_vis=ch(CH_SHADOW_VIS),
        shadow_pen=ch(CH_SHADOW_PEN),
        shadow_dist=ch(CH_SHADOW_DIST),
        obj_id=ch(CH_OBJ_ID).astype(jnp.int32),
    )


_KEY_INVALID = 0x7FFFFFFF
_TP_KEY_ORDER = os.environ.get("RTVS_TP_KEY", "oct_pos")


def _coherence_key(valid, o, d):
    """Sort key grouping continuations that will walk the same BVH nodes:
    direction octant (3 bits), then a 21-bit Morton code of the origin
    quantized to the valid-origin bounding box. Spawn-less lanes get the
    maximal key so they form a contiguous, skippable tail."""
    big = jnp.float32(3.0e38)
    i32 = jnp.int32
    oct_ = ((d[0] < 0).astype(i32)
            | ((d[1] < 0).astype(i32) << 1)
            | ((d[2] < 0).astype(i32) << 2))
    morton = jnp.zeros_like(oct_)
    for a in range(3):
        lo = jnp.min(jnp.where(valid, o[a], big))
        hi = jnp.max(jnp.where(valid, o[a], -big))
        rng = jnp.maximum(hi - lo, 1e-4)
        q = jnp.clip(((o[a] - lo) / rng * 127.0), 0.0, 127.0).astype(i32)
        for b in range(7):
            morton = morton | (((q >> b) & 1) << (3 * b + a))
    if _TP_KEY_ORDER == "pos_oct":
        key = (morton << 3) | oct_
    else:
        key = (oct_ << 21) | morton
    return jnp.where(valid, key, i32(_KEY_INVALID))


def render_accum_pallas_twophase(scene: FlatScene, cfg: RenderConfig, row_start,
                                 num_rows: int, interpret: bool = False):
    """Two-phase megakernel: per-pixel records + one machine iteration in
    screen tiles (phase A), then the spawned continuations regrouped into
    coherence-sorted tiles and resumed (phase B).

    Same accumulator contract as render_accum_pallas; the split attacks the
    measured cost structure of glass mesh scenes — packet traversal pays
    the UNION of a tile's node visits, and secondary bounces from curved
    glass are incoherent within screen tiles (~45 ms of a 57 ms wine-glass
    frame). Sorting is XLA-side lax.sort (~2 ms for 2M keys); the pixel
    coords ride along as sort payloads so no gather is needed, and phase B
    re-derives the machine state from them bit-exactly instead of paying a
    wide (slow) gather of exported state.
    """
    # Phase B re-derives primary rays with zeroed DoF blue-noise channels,
    # so a defocused camera would resume subtrees from primaries that
    # differ from phase A's. engine._pick_backend gates auto-selection to
    # aperture==0 and Engine.render re-checks forced 'pallas2' on the
    # concrete scene; here the value is usually traced, so only enforce
    # when it is concrete (mirrors the spp==1 gate).
    import jax.core as _core

    if not isinstance(scene.aperture_size, _core.Tracer):
        assert float(scene.aperture_size) <= 1e-3, (
            "two-phase megakernel requires aperture ~ 0 (phase B re-derives "
            f"primaries without DoF jitter); got {float(scene.aperture_size)}")
    args, caps = _pack_args(scene, cfg, row_start)
    grid_h = _cdiv(num_rows, TILE_H)
    grid_w = _cdiv(cfg.width, TILE_W)

    def table_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    out_a = pl.pallas_call(
        make_kernel(cfg, caps, phase_a=True),
        out_shape=jax.ShapeDtypeStruct((NUM_CH_A, grid_h * TILE_H, grid_w * TILE_W), F32),
        grid=(grid_h, grid_w),
        in_specs=[table_spec(a) for a in args],
        out_specs=pl.BlockSpec(
            (NUM_CH_A, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*args)

    n = num_rows * cfg.width
    crop = out_a[:, :num_rows, : cfg.width]
    valid = crop[CH_SPAWN_VALID].reshape(n) > 0.5
    so = tuple(crop[CH_SPAWN_O + i].reshape(n) for i in range(3))
    sd = tuple(crop[CH_SPAWN_D + i].reshape(n) for i in range(3))
    if "skip_b" in _DEBUG_DISABLE:  # perf bisect: phase A cost alone
        return _accum_dict(out_a[:NUM_CH], num_rows, cfg.width)
    if "tpsort" in _DEBUG_DISABLE:  # perf bisect: B without regrouping
        key = jnp.where(valid, 0, jnp.int32(_KEY_INVALID))
    else:
        key = _coherence_key(valid, so, sd)

    ii = jnp.arange(n, dtype=jnp.int32)
    xx_n = ii % cfg.width
    yy_n = jnp.asarray(row_start, jnp.int32) + ii // cfg.width
    skey, sxx, syy = jax.lax.sort((key, xx_n, yy_n), num_keys=1)
    vmask = (skey != _KEY_INVALID).astype(jnp.int32)

    lanes = TILE_H * TILE_W
    npad = _cdiv(n, lanes) * lanes
    pad = npad - n
    if pad:
        sxx = jnp.pad(sxx, (0, pad))
        syy = jnp.pad(syy, (0, pad))
        vmask = jnp.pad(vmask, (0, pad))
    rows = npad // TILE_W
    shape2 = (rows, TILE_W)

    def lane_spec():
        return pl.BlockSpec((TILE_H, TILE_W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def table_spec_b(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_b = pl.pallas_call(
        make_kernel_b(cfg, caps),
        out_shape=jax.ShapeDtypeStruct((NUM_CH_B, rows, TILE_W), F32),
        grid=(rows // TILE_H,),
        in_specs=[lane_spec(), lane_spec(), lane_spec()]
        + [table_spec_b(a) for a in args],
        out_specs=pl.BlockSpec(
            (NUM_CH_B, TILE_H, TILE_W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(sxx.reshape(shape2), syy.reshape(shape2), vmask.reshape(shape2), *args)

    # Restore pixel order: a second sort keyed on the (unique) pixel id.
    spix = (syy[:n] - jnp.asarray(row_start, jnp.int32)) * cfg.width + sxx[:n]
    bc = [out_b[c].reshape(npad)[:n] for c in range(NUM_CH_B)]
    _, r0, r1, r2, rbounce = jax.lax.sort(
        (spix, bc[CHB_COLOR], bc[CHB_COLOR + 1], bc[CHB_COLOR + 2],
         bc[CHB_BOUNCE]),
        num_keys=1,
    )

    acc = _accum_dict(out_a[:NUM_CH], num_rows, cfg.width)
    acc["color"] = acc["color"] + jnp.stack([r0, r1, r2], axis=-1)
    acc["bounce"] = jnp.maximum(acc["bounce"], rbounce)
    acc["rays"] = acc["rays"] + jnp.sum(out_b[CHB_RAYS])
    return acc


# ---------------------------------------------------------------------------
# Triangle-mesh packet traversal (threaded BVH, scalar pointer chase)
# ---------------------------------------------------------------------------
# The BVH is threaded (hit_next / miss_next, ops/bvh.py), so the whole tile
# walks it with ONE scalar node pointer: descend when ANY lane's ray enters
# the node's AABB (classic packet traversal — rays in a tile are coherent),
# test leaf triangles across all lanes on the VPU, and capture the winning
# triangle's data into per-lane registers with masked selects. No per-lane
# stacks, no gathers.

def _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, tmax):
    t_near = tmin
    t_far = tmax
    for c in range(3):
        t0 = (bb_lo[c] - o[c]) * inv_d[c]
        t1 = (bb_hi[c] - o[c]) * inv_d[c]
        t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
        t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
    return t_near <= t_far


def _safe_inv(d):
    tiny = 1e-12
    return tuple(
        1.0 / jnp.where(jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c) for c in d
    )


def _tri_hit_plane_k(o, d, g, k, tmin, tmax):
    """Plane-repr triangle test (scalar row g[k] of the pack_mesh tri_geo
    table) across all lanes. ~26 lane-ops versus Moller-Trumbore's ~55 —
    the leaf loops are VPU-issue-bound, so this is a direct time cut.
    Same u/v/t contract as ops/bvh.py _tri_hit up to rounding; the
    |n.d| > 1e-9 guard equals MT's |det| > 1e-9 (det = -n.d)."""
    nx_, ny_, nz_ = _tg(g, k, 0), _tg(g, k, 1), _tg(g, k, 2)
    nd = d[0] * nx_ + d[1] * ny_ + d[2] * nz_
    no = o[0] * nx_ + o[1] * ny_ + o[2] * nz_
    ok = jnp.abs(nd) > 1e-9  # TRIANGLE_CULL_DISABLE: both windings hit
    t = (_tg(g, k, 3) - no) / jnp.where(ok, nd, 1.0)
    hx = o[0] + t * d[0]
    hy = o[1] + t * d[1]
    hz = o[2] + t * d[2]
    u = _tg(g, k, 7) + hx * _tg(g, k, 4) + hy * _tg(g, k, 5) + hz * _tg(g, k, 6)
    v = _tg(g, k, 11) + hx * _tg(g, k, 8) + hy * _tg(g, k, 9) + hz * _tg(g, k, 10)
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= tmin) & (t <= tmax)
    return hit, t, u, v, nd


class KMesh:
    """Kernel-side mesh refs + static sizes.

    With hbm_scratch set, tri_geo/tri_extra are HBM-resident refs that the
    leaf fetch streams through the given VMEM scratch buffers by async DMA
    (the BLAS-without-a-size-cap analog of AccelerationStructure.cpp:560-663
    — only the node table must fit VMEM)."""

    def __init__(self, nodes_fi, tri_geo, tri_extra, inst_tbl,
                 num_nodes, num_tris, leaf_size, num_inst, hbm_scratch=None):
        self.nodes_fi = nodes_fi  # [Nn/8,128]: 8 nodes/row, 16 fields each
        # (node fields: bbmin3 bbmax3 hit miss tstart tcount pad6)
        self.tri_geo = tri_geo  # [T/8,128]: 8 tris/row, 12 plane-repr fields each
        self.tri_extra = tri_extra  # [T/8,128]: 8 tris/row, n0 n1 n2 inst(asf32)
        self.inst_tbl = inst_tbl  # [I,8]: transmission absorb3 beer3 pad
        self.num_nodes = num_nodes
        self.num_tris = num_tris
        self.leaf_size = leaf_size
        self.num_inst = num_inst
        # (geo_scratch [16,128], extra_scratch [16,128], dma_sems [2]) or None
        self.hbm_scratch = hbm_scratch


def _node_row(km, node, sub=False):
    """Fetch node fields from the node table (layout from its shape).

    Flat [Nn,16] (512 B/node after lane padding): one dynamic row load —
    the fast layout, used while the table fits the VMEM budget.
    Dense-packed [Nn/8,128] (64 B/node): 8 nodes/row, one dynamic row
    load + one dynamic lane rotate brings node (i&7) to lanes 0..15 —
    8x the capacity, measured ~16-18% slower per frame on walk-heavy
    scenes (233k-tri probe: 32.7 vs 28.1 ms opaque), so pack_mesh only
    packs past _NODE_PACK_MB.

    With sub=True, also returns lanes 10/11 — the node's padded subtree
    triangle range (start, count) that pack_mesh stores for the shadow
    fat-leaf walk."""
    if km.nodes_fi.shape[1] != 128:  # flat [Nn,16]
        nf = km.nodes_fi[pl.ds(node, 1), :]  # (1,16)
    else:
        row = km.nodes_fi[pl.ds(node >> 3, 1), :]  # (1,128): 8 packed nodes
        nf = pltpu.roll(row, (128 - (node & 7) * 16) % 128, axis=1)
    bb_lo = (nf[0, 0], nf[0, 1], nf[0, 2])
    bb_hi = (nf[0, 3], nf[0, 4], nf[0, 5])
    base = (bb_lo, bb_hi, nf[0, 6].astype(I32), nf[0, 7].astype(I32),
            nf[0, 8].astype(I32), nf[0, 9].astype(I32))
    if sub:
        return base + (nf[0, 10].astype(I32), nf[0, 11].astype(I32))
    return base


def _mesh_root_bb(km):
    """Root AABB (node 0) as per-packet scalars — one STATIC row-0 load.

    Both node layouts place node 0's 16 fields at lanes 0..15 of row 0
    (flat [Nn,16]: row 0 IS node 0; dense-packed [Nn/8,128]: node 0 is
    the first 16-lane group), so no roll is needed."""
    nf = km.nodes_fi[pl.ds(0, 1), :]
    return (nf[0, 0], nf[0, 1], nf[0, 2]), (nf[0, 3], nf[0, 4], nf[0, 5])


def _leaf_pad(leaf_size):
    return -(-leaf_size // 8) * 8


def _tg(tbl, k, j):
    """Field j of triangle k in a dense-packed leaf window (8 tris/row,
    12 fields each; k and j are Python ints — fully static indexing)."""
    return tbl[k >> 3, (k & 7) * 12 + j]


def _leaf_rows(km, tri_start, extra=False):
    """Fetch a whole leaf's dense triangle rows with one aligned block load.

    Leaf tri ranges are 8-aligned (ops/bvh.py collapse_leaves align=8), so
    a leaf occupies whole 8-tri rows starting at dense row tri_start/8 —
    but that row index is not itself 8-aligned, and Mosaic requires
    provably-%8 sublane starts for block loads. So: load the enclosing
    8-aligned SIXTEEN-row window (covers offset 0..7 plus up to 8 leaf
    rows = leaf_size 64) and roll the leaf's first row to the top; the
    per-triangle indexing below the roll is fully static (_tg).
    """
    from .. import bvh as bvh_mod

    r0 = tri_start >> 3
    if km.hbm_scratch is not None:
        # HBM-resident tables: DMA the same 8-aligned 16-row window into
        # VMEM scratch, then roll exactly like the resident path. The two
        # copies run concurrently; latency is paid once per LEAF visit
        # (node walks stay VMEM-resident), which measures within ~2x of
        # the resident path on leaf-bound scenes.
        geo_s, ex_s, sems = km.hbm_scratch
        w0 = pl.multiple_of((r0 >> 3) << 3, 8)
        off = r0 - w0
        cp_g = pltpu.make_async_copy(
            km.tri_geo.at[pl.ds(w0, 16), :], geo_s, sems.at[0])
        cp_g.start()
        if extra:
            cp_e = pltpu.make_async_copy(
                km.tri_extra.at[pl.ds(w0, 16), :], ex_s, sems.at[1])
            cp_e.start()
        cp_g.wait()
        g = pltpu.roll(geo_s[...], (16 - off) % 16, axis=0)
        ex = None
        if extra:
            cp_e.wait()
            ex = pltpu.roll(ex_s[...], (16 - off) % 16, axis=0)
        return g, ex
    if bvh_mod.MK_LEAF_ALIGN % 64 == 0:
        # 64-tri-aligned leaf ranges: the dense row start is provably %8,
        # so the leaf block-loads directly — no window, no roll (the
        # padding trade is ~2.3x table rows for 24-tri leaves).
        base = pl.multiple_of(r0, 8)
        g = km.tri_geo[pl.ds(base, 8), :]
        ex = km.tri_extra[pl.ds(base, 8), :] if extra else None
        return g, ex
    w0 = pl.multiple_of((r0 >> 3) << 3, 8)
    off = r0 - w0  # dynamic, 0..7
    g = km.tri_geo[pl.ds(w0, 16), :]
    g = pltpu.roll(g, (16 - off) % 16, axis=0)
    if extra:
        ex = km.tri_extra[pl.ds(w0, 16), :]
        ex = pltpu.roll(ex, (16 - off) % 16, axis=0)
    else:
        ex = None
    return g, ex


# Default ON: measured 46.5 vs 48.8 ms on the wine glass (sweep in
# scripts/probe_leaf_tiers2.py; leaf32/48 with tiers measured 48.1/50.8,
# so leaf24 stays optimal). Set RTVS_MK_LEAF_TIERS=0 to disable.
_LEAF_TIERS = os.environ.get("RTVS_MK_LEAF_TIERS", "1") == "1"

# Shadow fat-leaf walk: the count-based shadow traversal tests any
# internal node whose padded subtree fits one leaf window (<=64 tris) as
# a single fat leaf instead of descending it (bit-identical hit set; see
# mesh_shadow_count_k docstring). FALSIFIED as a default on the canonical
# scene (143.8 vs 142.3 ms spp1/b5 1080p — the saved node visits don't
# pay for the pad-slot tri tests; shadow cost is walk-entry/fixed-cost
# bound, consistent with the leaf64-global sweep where the shadow
# component got WORSE, 74.1 vs 61.0 ms). Kept opt-in for deeper trees
# where subtree merging removes real descent: RTVS_MK_SHADOW_FAT=1.
_SHADOW_FAT = os.environ.get("RTVS_MK_SHADOW_FAT", "0") == "1"


def _leaf_dispatch(leaf_now, tri_count, leaf_size, leaf_fn, carry):
    """Run leaf_fn(carry, n_tests) under lax.cond when leaf_now.

    RTVS_MK_LEAF_TIERS=1 dispatches on the leaf's occupancy (<=8 / <=16 /
    full): mean wine-glass leaf occupancy is 17.6 of 24, so the flat
    leaf_size loop wastes ~27% of its triangle tests on (k < tri_count)
    masked-off slots. Two extra SCALAR conds per leaf visit buy back the
    skipped vector work.
    """
    if not _LEAF_TIERS or leaf_size <= 8:
        return jax.lax.cond(leaf_now, lambda c: leaf_fn(c, leaf_size),
                            lambda c: c, carry)
    tiers = [t for t in (8, 16, 24, 32, 48) if t < leaf_size] + [leaf_size]

    def tier_fn(n):
        return lambda cc: leaf_fn(cc, n)

    def build(i):
        if i == len(tiers) - 1:
            return tier_fn(tiers[i])
        nxt = build(i + 1)
        t = tiers[i]
        return lambda cc: jax.lax.cond(tri_count <= t, tier_fn(t), nxt, cc)

    return jax.lax.cond(leaf_now, build(0), lambda c: c, carry)


def mesh_closest_k(km: KMesh, o, d, tmin, tmax, skip_active, skip_inst,
                   thick_inst=None):
    """Packet closest-hit over the threaded BVH.

    Mosaic-safe: all while carries are f32/i32 (no i1), and lane-varying
    carries are initialised from a lane-varying zero (`o[0]*0`) so the
    layout stays varying from iteration 0 (see the dirty-init note in
    _run_sample_k).

    thick_inst (optional, [*,*] i32, -1 = none): lanes with a pending
    same-instance thickness query ride this walk instead of paying a
    separate mesh_thickness_k traversal — the refract child's ray IS the
    reference's thickness ray (RayGen.hlsl:650 vs 776: both originate at
    hitPosition + refractDir*0.002). Pending lanes keep an open t interval
    until their first same-instance hit (AcceptHitAndEndSearch parity,
    AnyHit_Thickness_Triangle), accumulated from the SAME per-triangle test
    the closest search evaluates. Returns thick_t/thick_hit in the dict.
    """
    shape = o[0].shape
    inv_d = _safe_inv(d)
    zero = o[0] * 0.0  # lane-varying zero (dirty init)
    izero = zero.astype(I32)
    skip_i = jnp.where(skip_active, skip_inst, -1)
    track = thick_inst is not None
    big = F32(1e30)

    count_stats = _STATS in ("nodes", "leaves")

    def cond(c):
        return c[0] >= 0

    def body(c):
        # Small carry matters: the while loop's lane-array carry is spilled
        # VMEM state per node visit, so the smooth normal is interpolated
        # at candidate time (3 floats) instead of carrying 9 vertex-normal
        # components + barycentrics to the end.
        c = list(c)
        node = c.pop(0)
        cnt = c.pop(0) if count_stats else None
        if track:
            thick_t, thick_f = c[-2], c[-1]
            c = c[:-2]
        (best_t, best_inst, nx, ny, nz, gdot) = c
        bb_lo, bb_hi, hit_next, miss_next, tri_start, tri_count = _node_row(km, node)
        if track:
            pend = (thick_inst >= 0) & (thick_f == 0)
            bound = jnp.where(pend, big, best_t)
        else:
            pend = None
            bound = best_t
        lane_hit = _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, bound)
        any_hit = jnp.any(lane_hit)
        is_leaf = tri_count > 0
        # capture the box mask as i32 — Mosaic cannot pass i1 vectors
        # across scf.if region boundaries (promotes to i8, then fails
        # the i8->i1 trunc)
        lh_i = lane_hit.astype(I32)
        pend_i = pend.astype(I32) if track else None

        def leaf_tests(carry, n_tests):
            carry = list(carry)
            if track:
                thick_t, thick_hit_i = carry[-2], carry[-1]
                carry = carry[:-2]
            (best_t, best_inst, nx, ny, nz, gdot) = carry
            g, exm = _leaf_rows(km, tri_start, extra=True)
            for k in range(n_tests):
                inst = _tg(exm, k, 9).astype(I32)
                bnd = jnp.where(pend_i != 0, big, best_t) if track else best_t
                th, tt, tu, tv, nd = _tri_hit_plane_k(o, d, g, k, tmin, bnd)
                th = th & (lh_i != 0) & (k < tri_count)
                if track:
                    tm = th & (inst == thick_inst) & (tt < thick_t)
                    thick_t = jnp.where(tm, tt, thick_t)
                    thick_hit_i = thick_hit_i | tm.astype(I32)
                better = th & (inst != skip_i) & (tt < best_t)
                best_t = jnp.where(better, tt, best_t)
                best_inst = jnp.where(better, inst, best_inst)
                tw = 1.0 - tu - tv
                nx = jnp.where(better, _tg(exm, k, 0) * tw + _tg(exm, k, 3) * tu + _tg(exm, k, 6) * tv, nx)
                ny = jnp.where(better, _tg(exm, k, 1) * tw + _tg(exm, k, 4) * tu + _tg(exm, k, 7) * tv, ny)
                nz = jnp.where(better, _tg(exm, k, 2) * tw + _tg(exm, k, 5) * tu + _tg(exm, k, 8) * tv, nz)
                # d . n_geo of the winner decides front-face; the
                # geometric normal itself is never needed (small carry
                # = less spilled VMEM per node visit)
                gdot = jnp.where(better, nd, gdot)
            out = (best_t, best_inst, nx, ny, nz, gdot)
            if track:
                out = out + (thick_t, thick_hit_i)
            return out

        leaf_now = any_hit & is_leaf
        leaf_carry = (best_t, best_inst, nx, ny, nz, gdot)
        if track:
            leaf_carry = leaf_carry + (thick_t, thick_f)
        updated = _leaf_dispatch(
            leaf_now, tri_count, km.leaf_size, leaf_tests, leaf_carry,
        )
        nxt = jnp.where(any_hit, hit_next, miss_next)
        if count_stats:
            inc = jnp.int32(1) if _STATS == "nodes" else leaf_now.astype(I32)
            return (nxt, cnt + inc, *updated)
        return (nxt, *updated)

    init = (
        jnp.int32(0), tmax + zero, izero - 1,
        zero, zero, zero, zero,
    )
    if track:
        init = init + (zero + big, izero)
    if count_stats:
        init = (init[0], jnp.int32(0), *init[1:])
    out = list(jax.lax.while_loop(cond, body, init))
    out.pop(0)
    cnt = out.pop(0) if count_stats else None
    thick_t = thick_f = None
    if track:
        thick_t, thick_f = out[-2], out[-1]
        out = out[:-2]
    (best_t, best_inst, nx, ny, nz, gdot) = out
    # sentinel-based hit: tmax may arrive pre-tightened by analytic hits,
    # so "improved vs tmax" is no longer a usable criterion
    hit = best_inst >= 0
    smooth = vnorm((nx, ny, nz))
    res = dict(hit=hit, t=best_t, inst=best_inst, smooth=smooth, gdot=gdot,
               visits=cnt)
    if track:
        res["thick_hit"] = thick_f != 0
        res["thick_t"] = thick_t
    return res


def mesh_shadow_k(km: KMesh, o, d, max_dist, blocked0=None):
    """Packet shadow traversal: transmission product over every crossing
    (AnyHit_Shadow_Triangle semantics, ops/bvh.py traverse_shadow).
    Beer-Lambert absorption factors arrive pre-exponentiated in inst_tbl.

    blocked0: lanes whose search already ENDED on an opaque analytic hit
    (AcceptHitAndEndSearch). They start blocked — no steering, no leaf
    accumulation — and their outputs are forced to the blocked values the
    caller would overwrite anyway (vis=0, color=0)."""
    shape = o[0].shape
    inv_d = _safe_inv(d)
    zero = o[0] * 0.0
    tmin = F32(C.RAY_TMIN)

    def cond(c):
        return c[0] >= 0

    def body(c):
        node, vis, cr, cg, cb, occ, blocked_i = c
        bb_lo, bb_hi, hit_next, miss_next, tri_start, tri_count = _node_row(km, node)
        lane_hit = _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, max_dist)
        # Opaque hits END the search (AcceptHitAndEndSearch,
        # AnyHit_Shadow.hlsl:44-49,76-81): blocked lanes stop steering the
        # packet and stop accumulating — the whole walk exits once every
        # shadowed lane is blocked.
        lane_hit = lane_hit & (blocked_i == 0)
        any_hit = jnp.any(lane_hit)
        is_leaf = tri_count > 0
        lh_i = lane_hit.astype(I32)

        def leaf_tests(carry, n_tests):
            vis, cr, cg, cb, occ, blocked_i = carry
            g, exm = _leaf_rows(km, tri_start, extra=True)
            # Hoist the per-instance material rows out of the triangle
            # loop: a dynamic inst_tbl row load per triangle per leaf
            # visit measured ~9 ms/frame on the wine glass (56.1 -> 47.1).
            # Few-instance scenes preload every row and select by the
            # triangle's instance id (tiny [1,8] selects); only >8
            # instances fall back to the dynamic load.
            if km.num_inst <= 8:
                it_rows = [km.inst_tbl[pl.ds(i, 1), :] for i in range(km.num_inst)]
            else:
                it_rows = None
            for k in range(n_tests):
                th, tt, _, _, _ = _tri_hit_plane_k(o, d, g, k, tmin, max_dist)
                th = th & (lh_i != 0) & (k < tri_count)
                # Beer factors pre-exponentiated per instance (pack_mesh)
                if it_rows is None:
                    inst = _tg(exm, k, 9).astype(I32)
                    it = km.inst_tbl[pl.ds(inst, 1), :]
                elif len(it_rows) == 1:
                    it = it_rows[0]
                else:
                    inst = _tg(exm, k, 9).astype(I32)
                    it = it_rows[0]
                    for i in range(1, len(it_rows)):
                        it = jnp.where(inst == i, it_rows[i], it)
                trans = it[0, 0]
                opaque = th & (trans < 0.01)
                blocked_i = blocked_i | opaque.astype(I32)
                translucent = th & (trans >= 0.01)
                vis = jnp.where(translucent, vis * trans, vis)
                cr = jnp.where(translucent, cr * it[0, 4], cr)
                cg = jnp.where(translucent, cg * it[0, 5], cg)
                cb = jnp.where(translucent, cb * it[0, 6], cb)
                occ = jnp.where(th, jnp.minimum(occ, tt), occ)
            return vis, cr, cg, cb, occ, blocked_i

        leaf_now = any_hit & is_leaf
        vis, cr, cg, cb, occ, blocked_i = _leaf_dispatch(
            leaf_now, tri_count, km.leaf_size, leaf_tests,
            (vis, cr, cg, cb, occ, blocked_i)
        )
        nxt = jnp.where(any_hit, hit_next, miss_next)
        return (nxt, vis, cr, cg, cb, occ, blocked_i)

    one = 1.0 + zero
    blocked_init = izero_like(zero)
    if blocked0 is not None:
        blocked_init = blocked_init | blocked0.astype(I32)
    init = (jnp.int32(0), one, one, one, one,
            zero + F32(C.NRD_FP16_MAX), blocked_init)
    _, vis, cr, cg, cb, occ, blocked_i = jax.lax.while_loop(cond, body, init)
    blocked = blocked_i != 0
    vis = jnp.where(blocked, 0.0, vis)
    color = vwhere(blocked, vzeros(shape), (cr, cg, cb))
    return vis, color, occ


def _pow_u8(base_scalar, n_vec, one_vec):
    """base ** n for integer n in [0,255] by repeated squaring — pure
    multiplies, so both backends produce bit-identical results (unlike
    exp/log whose lowerings differ between Mosaic and CPU XLA). The base
    stays scalar; only the select/multiply chain is lane-wide."""
    r = one_vec
    b = base_scalar
    for bit in range(8):
        r = jnp.where(((n_vec >> bit) & 1) != 0, r * b, r)
        if bit < 7:
            b = b * b
    return r


def mesh_shadow_count_k(km: KMesh, o, d, max_dist, blocked0=None):
    """Count-based packet shadow traversal (<=8 instances).

    Per-crossing shadow factors are PER-INSTANCE CONSTANTS (transmission
    and the pre-exponentiated Beer tint, AnyHit_Shadow.hlsl:84), so the
    walk only needs each lane's per-instance CROSSING COUNT: vis =
    prod trans_i^n_i, color = prod beer_i^n_i, evaluated once at walk end
    by repeated squaring (bit-exact across backends, see
    bvh.traverse_shadow's count path). The leaf loop drops all inst_tbl
    reads and material multiplies — one shift-add + occ-min per triangle —
    and the while carry shrinks from 5 floats to 1-2 packed i32 count
    words (8 bits/instance; crossings cap at 255 per instance per
    segment, far beyond any sane mesh silhouette).

    Opaque instances end the search (AcceptHitAndEndSearch) via a per-walk
    scalar opacity bitmask; blocked0 seeds analytically-blocked lanes.

    RTVS_MK_SHADOW_FAT=1 (opt-in, falsified as a default — see the flag
    comment): any internal node whose whole PADDED subtree fits one leaf
    window (<=64 tris) is tested as a single fat leaf and its descent
    skipped. Shadow rays need no nearest-hit ordering, pad slots are
    inert degenerate triangles (collapse_leaves), and a lane that misses
    an inner box can't hit its triangles — so the hit set, counts, occ
    and blocked are bit-identical to the fine walk
    (tests/test_megakernel.py::test_shadow_fat_walk_bit_identical)."""
    shape = o[0].shape
    inv_d = _safe_inv(d)
    zero = o[0] * 0.0
    izero = zero.astype(I32)
    tmin = F32(C.RAY_TMIN)
    ni = km.num_inst
    # word routing below is hardwired to 2 words (hi = inst >= 4); the
    # call sites gate on num_inst <= 8, so instance 8+ can never alias
    # into word 1 — keep the invariant explicit
    assert ni <= 8, "count walk requires <=8 instances (callers gate this)"
    n_words = (ni + 3) // 4  # 4 instances x 8 bits per count word
    fat_walk = _SHADOW_FAT and km.leaf_size <= 64

    # Per-walk scalar opacity bitmask (transmission < 0.01 ends the search)
    opq = jnp.int32(0)
    for i in range(ni):
        row = km.inst_tbl[pl.ds(i, 1), :]
        opq = opq | (jnp.where(row[0, 0] < 0.01, 1, 0).astype(jnp.int32) << i)

    def cond(c):
        return c[0] >= 0

    def body(c):
        node, occ, blocked_i = c[0], c[1], c[2]
        cnts = list(c[3:])
        if fat_walk:
            (bb_lo, bb_hi, hit_next, miss_next, _ts, _tc,
             eff_start, eff_count) = _node_row(km, node, sub=True)
            # leaves have sub == their own padded range, so one predicate
            # covers both: test-and-skip any <=64-padded-tri subtree
            is_leaf = eff_count <= 64
            leaf_size = 64
        else:
            (bb_lo, bb_hi, hit_next, miss_next, eff_start,
             eff_count) = _node_row(km, node)
            is_leaf = eff_count > 0
            leaf_size = km.leaf_size
        lane_hit = _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, max_dist)
        lane_hit = lane_hit & (blocked_i == 0)
        any_hit = jnp.any(lane_hit)
        lh_i = lane_hit.astype(I32)

        def leaf_tests(carry, n_tests):
            occ, blocked_i = carry[0], carry[1]
            cnts = list(carry[2:])
            g, exm = _leaf_rows(km, eff_start, extra=True)
            for k in range(n_tests):
                th, tt, _, _, _ = _tri_hit_plane_k(o, d, g, k, tmin, max_dist)
                th = th & (lh_i != 0) & (k < eff_count)
                th_i = th.astype(I32)
                inst = _tg(exm, k, 9).astype(I32)
                blocked_i = blocked_i | (th_i & ((opq >> inst) & 1))
                if n_words == 1:
                    cnts[0] = cnts[0] + (th_i << (inst * 8))
                else:
                    inc = th_i << ((inst & 3) * 8)
                    hi = inst >= 4
                    cnts[0] = cnts[0] + jnp.where(hi, 0, inc)
                    cnts[1] = cnts[1] + jnp.where(hi, inc, 0)
                occ = jnp.where(th, jnp.minimum(occ, tt), occ)
            return (occ, blocked_i, *cnts)

        leaf_now = any_hit & is_leaf
        occ, blocked_i, *cnts = _leaf_dispatch(
            leaf_now, eff_count, leaf_size, leaf_tests,
            (occ, blocked_i, *cnts),
        )
        # a tested fat subtree is SKIPPED (miss_next); plain leaves have
        # hit_next == miss_next so the classic select is unchanged
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf),
                        hit_next, miss_next)
        return (nxt, occ, blocked_i, *cnts)

    blocked_init = izero_like(zero)
    if blocked0 is not None:
        blocked_init = blocked_init | blocked0.astype(I32)
    init = (jnp.int32(0), zero + F32(C.NRD_FP16_MAX), blocked_init,
            *([izero] * n_words))
    out = jax.lax.while_loop(cond, body, init)
    occ, blocked_i = out[1], out[2]
    cnts = out[3:]

    one = 1.0 + zero
    vis = one
    cr = one
    cg = one
    cb = one
    for i in range(ni):
        word = cnts[i // 4]
        n_i = (word >> ((i & 3) * 8)) & 255
        row = km.inst_tbl[pl.ds(i, 1), :]
        # Opaque instances contribute via `blocked` only (their trans^n
        # would zero vis anyway, but keep them out of the product so the
        # translucent math never multiplies by 0^n).
        is_opq = (opq >> i) & 1
        n_i = jnp.where(is_opq != 0, 0, n_i)
        vis = vis * _pow_u8(row[0, 0], n_i, one)
        cr = cr * _pow_u8(row[0, 4], n_i, one)
        cg = cg * _pow_u8(row[0, 5], n_i, one)
        cb = cb * _pow_u8(row[0, 6], n_i, one)
    blocked = blocked_i != 0
    vis = jnp.where(blocked, 0.0, vis)
    color = vwhere(blocked, vzeros(shape), (cr, cg, cb))
    return vis, color, occ


def izero_like(zero_f32):
    return zero_f32.astype(I32)


def mesh_shadow_ilv_count_k(km: KMesh, o, rays):
    """INTERLEAVED count-based shadow walks: N independent shadow rays'
    walks (same per-lane origin, e.g. the dominant-light pair and/or the
    per-light soft samples) advance in ONE while loop with SEPARATE node
    pointers and separate steering — no union (the union-steered fusion
    was falsified: divergent rays made shared visits pay every ray's
    leaf tests). Each walk visits exactly its solo node sequence and
    runs exactly its solo leaf tests, so outputs are bit-identical to N
    sequential mesh_shadow_count_k walks BY CONSTRUCTION.

    The win is latency pipelining: a solo walk is a pointer-chasing
    chain (each iteration's dynamic node-row load feeds the AABB test
    that picks the next node — nothing overlaps the load's ~90+ cycle
    latency). Interleaved, each iteration issues N independent node
    loads whose latencies hide behind each other's steering compute,
    and the while-loop fixed cost is paid max(n_i) times instead of
    sum(n_i). A finished walk parks its pointer at -1 (its loads clamp
    to row 0, masked dead).

    rays: list of (d, max_dist, blocked0-or-None) tuples.
    Returns a list of (vis, color3, occ) per ray."""
    shape = o[0].shape
    zero = o[0] * 0.0
    izero = zero.astype(I32)
    tmin = F32(C.RAY_TMIN)
    ni = km.num_inst
    assert ni <= 8, "count walk requires <=8 instances (callers gate this)"
    n_words = (ni + 3) // 4
    nr = len(rays)
    invs = [_safe_inv(d) for d, _, _ in rays]

    opq = jnp.int32(0)
    for i in range(ni):
        row = km.inst_tbl[pl.ds(i, 1), :]
        opq = opq | (jnp.where(row[0, 0] < 0.01, 1, 0).astype(jnp.int32) << i)

    def cond(c):
        live = c[0] >= 0
        for r in range(1, nr):
            live = live | (c[r] >= 0)
        return live

    def half_step(node, inv_d, d, max_dist, occ, blocked_i, cnts):
        """One walk's iteration: node row, box test, leaf tests, next."""
        live = node >= 0
        (bb_lo, bb_hi, hit_next, miss_next, tri_start,
         tri_count) = _node_row(km, jnp.maximum(node, 0))
        lane_hit = _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, max_dist)
        lane_hit = lane_hit & (blocked_i == 0)
        any_hit = jnp.any(lane_hit) & live
        is_leaf = tri_count > 0
        lh_i = lane_hit.astype(I32)

        def leaf_tests(carry, n_tests):
            occ, blocked_i = carry[0], carry[1]
            cnts = list(carry[2:])
            g, exm = _leaf_rows(km, tri_start, extra=True)
            for k in range(n_tests):
                th, tt, _, _, _ = _tri_hit_plane_k(o, d, g, k, tmin, max_dist)
                th = th & (lh_i != 0) & (k < tri_count)
                th_i = th.astype(I32)
                inst = _tg(exm, k, 9).astype(I32)
                blocked_i = blocked_i | (th_i & ((opq >> inst) & 1))
                if n_words == 1:
                    cnts[0] = cnts[0] + (th_i << (inst * 8))
                else:
                    inc = th_i << ((inst & 3) * 8)
                    hi = inst >= 4
                    cnts[0] = cnts[0] + jnp.where(hi, 0, inc)
                    cnts[1] = cnts[1] + jnp.where(hi, inc, 0)
                occ = jnp.where(th, jnp.minimum(occ, tt), occ)
            return (occ, blocked_i, *cnts)

        leaf_now = any_hit & is_leaf
        occ, blocked_i, *cnts = _leaf_dispatch(
            leaf_now, tri_count, km.leaf_size, leaf_tests,
            (occ, blocked_i, *cnts),
        )
        nxt = jnp.where(live, jnp.where(any_hit, hit_next, miss_next),
                        jnp.int32(-1))
        return nxt, occ, blocked_i, cnts

    def body(c):
        nodes = list(c[:nr])
        occs = list(c[nr:2 * nr])
        blks = list(c[2 * nr:3 * nr])
        cnts = list(c[3 * nr:])
        for r in range(nr):
            d, max_dist, _ = rays[r]
            nodes[r], occs[r], blks[r], cw = half_step(
                nodes[r], invs[r], d, max_dist, occs[r], blks[r],
                cnts[r * n_words:(r + 1) * n_words])
            cnts[r * n_words:(r + 1) * n_words] = cw
        return (*nodes, *occs, *blks, *cnts)

    inf = zero + F32(C.NRD_FP16_MAX)
    blk_inits = []
    for _, _, b0 in rays:
        bi = izero_like(zero)
        if b0 is not None:
            bi = bi | b0.astype(I32)
        blk_inits.append(bi)
    init = (*([jnp.int32(0)] * nr), *([inf] * nr), *blk_inits,
            *([izero] * (nr * n_words)))
    out = jax.lax.while_loop(cond, body, init)
    occs = out[nr:2 * nr]
    blks = out[2 * nr:3 * nr]
    cnts = out[3 * nr:]

    one = 1.0 + zero

    def resolve(cnts_w, blk_i):
        vis, cr, cg, cb = one, one, one, one
        for i in range(ni):
            word = cnts_w[i // 4]
            n_i = (word >> ((i & 3) * 8)) & 255
            row = km.inst_tbl[pl.ds(i, 1), :]
            is_opq = (opq >> i) & 1
            n_i = jnp.where(is_opq != 0, 0, n_i)
            vis = vis * _pow_u8(row[0, 0], n_i, one)
            cr = cr * _pow_u8(row[0, 4], n_i, one)
            cg = cg * _pow_u8(row[0, 5], n_i, one)
            cb = cb * _pow_u8(row[0, 6], n_i, one)
        blocked = blk_i != 0
        vis = jnp.where(blocked, 0.0, vis)
        color = vwhere(blocked, vzeros(shape), (cr, cg, cb))
        return vis, color

    outs = []
    for r in range(nr):
        vis, color = resolve(cnts[r * n_words:(r + 1) * n_words], blks[r])
        outs.append((vis, color, occs[r]))
    return outs


def mesh_shadow2_count_k(km: KMesh, o, dA, maxA, dB, maxB,
                         blockedA0=None, blockedB0=None):
    """Fused dual-ray count-based shadow traversal: both dominant lights'
    shadow rays (same per-lane origin — the shaded hit point) walk the
    BVH TOGETHER, steered by the union of their box hits.

    Why: shadow-walk cost is node-descent-bound (the count walk's ~25%
    leaf-op cut moved the frame only ~3%), and the two rays share their
    origin, so their descents overlap heavily near the root. One fused
    walk pays the node loads, rolls, and while-loop fixed costs once for
    the union of visits instead of once per ray per visit.

    Bit-exactness vs two sequential mesh_shadow_count_k walks: per-ray
    triangle tests stay gated by that ray's own box hit, counts and
    occ-min are traversal-order independent, and genuine crossings arrive
    in the same threaded node order (the union steering visits a
    superset of each solo walk's nodes, in the same relative order), so
    the opaque end-search mask (AnyHit_Shadow.hlsl:44-49) freezes each
    lane at the same crossing either way."""
    shape = o[0].shape
    invA = _safe_inv(dA)
    invB = _safe_inv(dB)
    zero = o[0] * 0.0
    izero = zero.astype(I32)
    tmin = F32(C.RAY_TMIN)
    ni = km.num_inst
    assert ni <= 8, "count walk requires <=8 instances (callers gate this)"
    n_words = (ni + 3) // 4  # 4 instances x 8 bits per count word

    opq = jnp.int32(0)
    for i in range(ni):
        row = km.inst_tbl[pl.ds(i, 1), :]
        opq = opq | (jnp.where(row[0, 0] < 0.01, 1, 0).astype(jnp.int32) << i)

    def cond(c):
        return c[0] >= 0

    def body(c):
        node, occA, occB, blkA, blkB = c[0], c[1], c[2], c[3], c[4]
        cnts = list(c[5:])  # A's count words then B's
        bb_lo, bb_hi, hit_next, miss_next, tri_start, tri_count = _node_row(km, node)
        hitA = _ray_aabb_k(o, invA, bb_lo, bb_hi, tmin, maxA) & (blkA == 0)
        hitB = _ray_aabb_k(o, invB, bb_lo, bb_hi, tmin, maxB) & (blkB == 0)
        any_hit = jnp.any(hitA | hitB)
        is_leaf = tri_count > 0
        lhA = hitA.astype(I32)
        lhB = hitB.astype(I32)

        def leaf_tests(carry, n_tests):
            occA, occB, blkA, blkB = carry[0], carry[1], carry[2], carry[3]
            cnts = list(carry[4:])
            g, exm = _leaf_rows(km, tri_start, extra=True)
            for k in range(n_tests):
                inst = _tg(exm, k, 9).astype(I32)
                opq_i = (opq >> inst) & 1
                in_leaf = k < tri_count

                thA, ttA, _, _, _ = _tri_hit_plane_k(o, dA, g, k, tmin, maxA)
                thA = thA & (lhA != 0) & in_leaf
                thA_i = thA.astype(I32)
                blkA = blkA | (thA_i & opq_i)
                thB, ttB, _, _, _ = _tri_hit_plane_k(o, dB, g, k, tmin, maxB)
                thB = thB & (lhB != 0) & in_leaf
                thB_i = thB.astype(I32)
                blkB = blkB | (thB_i & opq_i)
                if n_words == 1:
                    cnts[0] = cnts[0] + (thA_i << (inst * 8))
                    cnts[1] = cnts[1] + (thB_i << (inst * 8))
                else:
                    incA = thA_i << ((inst & 3) * 8)
                    incB = thB_i << ((inst & 3) * 8)
                    hi = inst >= 4
                    cnts[0] = cnts[0] + jnp.where(hi, 0, incA)
                    cnts[1] = cnts[1] + jnp.where(hi, incA, 0)
                    cnts[n_words] = cnts[n_words] + jnp.where(hi, 0, incB)
                    cnts[n_words + 1] = cnts[n_words + 1] + jnp.where(hi, incB, 0)
                occA = jnp.where(thA, jnp.minimum(occA, ttA), occA)
                occB = jnp.where(thB, jnp.minimum(occB, ttB), occB)
            return (occA, occB, blkA, blkB, *cnts)

        leaf_now = any_hit & is_leaf
        out = _leaf_dispatch(leaf_now, tri_count, km.leaf_size, leaf_tests,
                             (occA, occB, blkA, blkB, *cnts))
        occA, occB, blkA, blkB = out[0], out[1], out[2], out[3]
        cnts = list(out[4:])
        nxt = jnp.where(any_hit, hit_next, miss_next)
        return (nxt, occA, occB, blkA, blkB, *cnts)

    blkA_init = izero_like(zero)
    blkB_init = izero_like(zero)
    if blockedA0 is not None:
        blkA_init = blkA_init | blockedA0.astype(I32)
    if blockedB0 is not None:
        blkB_init = blkB_init | blockedB0.astype(I32)
    init = (jnp.int32(0), zero + F32(C.NRD_FP16_MAX), zero + F32(C.NRD_FP16_MAX),
            blkA_init, blkB_init, *([izero] * (2 * n_words)))
    out = jax.lax.while_loop(cond, body, init)
    occA, occB, blkA, blkB = out[1], out[2], out[3], out[4]
    cnts = out[5:]

    one = 1.0 + zero
    visA, crA, cgA, cbA = one, one, one, one
    visB, crB, cgB, cbB = one, one, one, one
    for i in range(ni):
        wordA = cnts[i // 4]
        wordB = cnts[n_words + i // 4]
        nA = (wordA >> ((i & 3) * 8)) & 255
        nB = (wordB >> ((i & 3) * 8)) & 255
        row = km.inst_tbl[pl.ds(i, 1), :]
        is_opq = (opq >> i) & 1
        nA = jnp.where(is_opq != 0, 0, nA)
        nB = jnp.where(is_opq != 0, 0, nB)
        visA = visA * _pow_u8(row[0, 0], nA, one)
        crA = crA * _pow_u8(row[0, 4], nA, one)
        cgA = cgA * _pow_u8(row[0, 5], nA, one)
        cbA = cbA * _pow_u8(row[0, 6], nA, one)
        visB = visB * _pow_u8(row[0, 0], nB, one)
        crB = crB * _pow_u8(row[0, 4], nB, one)
        cgB = cgB * _pow_u8(row[0, 5], nB, one)
        cbB = cbB * _pow_u8(row[0, 6], nB, one)
    bA = blkA != 0
    bB = blkB != 0
    visA = jnp.where(bA, 0.0, visA)
    colorA = vwhere(bA, vzeros(shape), (crA, cgA, cbA))
    visB = jnp.where(bB, 0.0, visB)
    colorB = vwhere(bB, vzeros(shape), (crB, cgB, cbB))
    return (visA, colorA, occA), (visB, colorB, occB)


def mesh_thickness_k(km: KMesh, o, d, inst_id, active=None):
    """Packet same-instance thickness query (AnyHit_Thickness_Triangle,
    ops/bvh.py traverse_thickness).

    Lanes with active=False start with an empty (tmin, 0) interval so they
    don't steer the packet walk; their (hit, t) outputs are garbage the
    caller must mask."""
    inv_d = _safe_inv(d)
    zero = o[0] * 0.0
    tmin = F32(C.RAY_TMIN)
    big = F32(C.NRD_FP16_MAX)

    def cond(c):
        return c[0] >= 0

    def body(c):
        node, best_t, found_i = c
        bb_lo, bb_hi, hit_next, miss_next, tri_start, tri_count = _node_row(km, node)
        lane_hit = _ray_aabb_k(o, inv_d, bb_lo, bb_hi, tmin, best_t)
        # First same-instance hit ENDS the search (AcceptHitAndEndSearch,
        # AnyHit_Thickness_Triangle, AnyHit_Shadow.hlsl:111-129: the
        # reference commits whichever same-object hit traversal reaches
        # first, NOT the nearest). We take the nearest within the first
        # threaded-order leaf that yields any hit — deterministic and
        # identical to bvh.traverse_thickness, which walks the same
        # hit/miss links in the same order.
        lane_hit = lane_hit & (found_i == 0)
        any_hit = jnp.any(lane_hit)
        is_leaf = tri_count > 0
        lh_i = lane_hit.astype(I32)

        def leaf_tests(carry, n_tests):
            best_t, found_i = carry
            g, exm = _leaf_rows(km, tri_start, extra=True)
            hit_i = found_i & 0
            for k in range(n_tests):
                inst = _tg(exm, k, 9).astype(I32)
                th, tt, _, _, _ = _tri_hit_plane_k(o, d, g, k, tmin, best_t)
                th = th & (lh_i != 0) & (k < tri_count) & (inst == inst_id)
                best_t = jnp.where(th & (tt < best_t), tt, best_t)
                hit_i = hit_i | th.astype(I32)
            return best_t, found_i | hit_i

        best_t, found_i = _leaf_dispatch(any_hit & is_leaf, tri_count,
                                         km.leaf_size, leaf_tests,
                                         (best_t, found_i))
        return (jnp.where(any_hit, hit_next, miss_next), best_t, found_i)

    init_t = zero + big if active is None else jnp.where(active, big, 0.0) + zero
    _, best_t, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_t, izero_like(zero)))
    hit = best_t < big * 0.999  # ops/bvh.py traverse_thickness criterion
    return hit, jnp.where(hit, best_t, big)


def pack_mesh(mesh, shadow_absorb_scale=None) -> tuple:
    """MeshArrays -> kernel tables (device-side, fat-leaf tree + its own
    8-aligned leaf-ordered triangle arrays).

    tri_geo carries the plane-repr triangle test (ops/bvh.py plane_repr):
    n(0:3) d0(3) pu(4:7) pu0(7) pv(8:11) pv0(11) — the unnormalized
    geometric normal doubles as the face normal for shading. tri_extra:
    vertex normals n0/n1/n2 (0:9) + instance id (9). inst_tbl rows also
    carry the shadow Beer-Lambert factors pre-exponentiated at the current
    shadow absorption scale (AnyHit_Shadow.hlsl:84 exp moved out of the
    per-triangle loop — the scale is a traced scalar, so settings changes
    don't recompile)."""
    from .. import bvh as bvh_mod

    nn = mesh.mk_num_nodes
    nt = mesh.mk_num_tris
    # One 16-lane row per node: bbmin3 bbmax3 hit miss tstart tcount pad6
    # (links stored as f32 — exact below 2**24). Fusing the f32/i32 tables
    # halves node VMEM (Mosaic pads the lane dim to 128 either way) and
    # makes each node visit one load instead of two.
    nodes_fi = jnp.zeros((nn, 16), F32)
    nodes_fi = (nodes_fi.at[:, 0:3].set(mesh.mk_bbox_min)
                .at[:, 3:6].set(mesh.mk_bbox_max)
                .at[:, 6].set(mesh.mk_hit_next.astype(F32))
                .at[:, 7].set(mesh.mk_miss_next.astype(F32))
                .at[:, 8].set(mesh.mk_tri_start.astype(F32))
                .at[:, 9].set(mesh.mk_tri_count.astype(F32)))
    # Lanes 10/11: each node's PADDED subtree triangle range (start, count)
    # for the shadow fat-leaf walk — the descent-bound shadow traversal
    # treats any internal node whose whole subtree fits one leaf window
    # (<=64 padded tris) as a single fat leaf. Subtree ranges exist because
    # collapse_leaves re-emits triangles leaf-ordered in preorder, so the
    # subtree of node i covers the contiguous padded range from its first
    # leaf's start to its last leaf's aligned end — recoverable from the
    # threading invariant (miss_next[i] = first preorder node after i's
    # subtree). Pad slots are inert degenerate triangles (ops/bvh.py
    # collapse_leaves), so testing the whole padded range is count-exact.
    if nn > 0:
        cnt_i = mesh.mk_tri_count.astype(jnp.int32)
        start_i = mesh.mk_tri_start.astype(jnp.int32)
        leaf_m = cnt_i > 0
        pad_end = jnp.where(leaf_m, ((start_i + cnt_i + 7) // 8) * 8, 0)
        cpe = jax.lax.cummax(pad_end, axis=0)
        big = jnp.int32(2**30)
        nls = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(leaf_m, start_i, big))))
        ends = jnp.where(mesh.mk_miss_next < 0, nn,
                         mesh.mk_miss_next.astype(jnp.int32))
        sub_end = cpe[ends - 1]
        sub_start = jnp.minimum(nls, sub_end)
        sub_cnt = jnp.maximum(sub_end - sub_start, 0)
        nodes_fi = (nodes_fi.at[:, 10].set(sub_start.astype(F32))
                    .at[:, 11].set(sub_cnt.astype(F32)))
    # Dense-pack 8 nodes per 128-lane row (row-major reshape puts node i
    # at row i>>3, lanes (i&7)*16..+16): the [Nn,16] layout lane-pads to
    # 128 = 512 B/node; packed is 64 B/node. The per-visit lane rotate
    # that undoes it costs ~16-18% frame time on walk-heavy scenes
    # (scripts/probe_packed_nodes.py: 233k opaque 32.7 vs 28.1 ms), so
    # packing kicks in only when the flat table outgrows the VMEM budget
    # — it is what lifts the node-side mesh cap ~8x (1.17M tris probed:
    # 92.9 ms opaque / 280 ms glass at 1080p, nodes 7.07 MB packed where
    # flat would need 56 MB).
    if node_table_packed(nn):
        rn = -(-max(nn, 1) // 8)
        nodes_fi = jnp.pad(nodes_fi, ((0, rn * 8 - nn), (0, 0))).reshape(rn, 128)
    tri_geo = bvh_mod._plane_table(mesh.mk_v0, mesh.mk_edge1, mesh.mk_edge2)
    tri_extra = jnp.zeros((nt, 12), F32)
    tri_extra = (tri_extra.at[:, 0:3].set(mesh.mk_n0).at[:, 3:6].set(mesh.mk_n1)
                 .at[:, 6:9].set(mesh.mk_n2)
                 .at[:, 9].set(mesh.mk_inst.astype(F32)))
    # Dense-pack 8 triangles per 128-lane row (12 fields each, 96 lanes
    # used): the naive [T,12] layout pads every row to 128 lanes in VMEM —
    # an 8x waste that was the real ceiling on megakernel mesh size.
    # Leaf ranges are 8-aligned (bvh collapse align=8), so a leaf's
    # triangles occupy whole rows; _leaf_rows fetches an 8-row-aligned
    # 16-row window and rolls the leaf to the top.
    rt = -(-nt // 8)
    rt_pad = -(-max(rt, 1) // 8) * 8 + 16
    tri_geo = jnp.pad(tri_geo, ((0, rt * 8 - nt), (0, 0))).reshape(rt, 96)
    tri_geo = jnp.pad(tri_geo, ((0, rt_pad - rt), (0, 32)))
    tri_extra = jnp.pad(tri_extra, ((0, rt * 8 - nt), (0, 0))).reshape(rt, 96)
    tri_extra = jnp.pad(tri_extra, ((0, rt_pad - rt), (0, 32)))
    ni = mesh.inst_transmission.shape[0]
    inst_tbl = jnp.zeros((max(ni, 1), 8), F32)
    inst_tbl = (inst_tbl.at[:ni, 0].set(mesh.inst_transmission)
                .at[:ni, 1:4].set(mesh.inst_absorption))
    if shadow_absorb_scale is None:
        shadow_absorb_scale = jnp.float32(C.SHADOW_ABSORPTION_THICKNESS)
    has_ab = jnp.any(mesh.inst_absorption > 0.0, axis=-1, keepdims=True)
    beer = jnp.where(has_ab, jnp.exp(-mesh.inst_absorption * shadow_absorb_scale),
                     1.0)
    inst_tbl = inst_tbl.at[:ni, 4:7].set(beer)
    return nodes_fi, tri_geo, tri_extra, inst_tbl


# Flat [Nn,16] nodes up to this budget (the fast layout, 512 B/node after
# lane padding); beyond it pack_mesh dense-packs 8 nodes/row (64 B/node,
# ~16-18% slower walks, 8x capacity). 14 MB keeps every probed config
# (wine glass ... 233k tris) on the fast layout.
_NODE_PACK_MB = float(os.environ.get("RTVS_NODE_PACK_MB", "14"))


def node_table_packed(num_nodes: int) -> bool:
    return num_nodes * 512 > _NODE_PACK_MB * 2**20


def node_table_bytes(num_nodes: int) -> int:
    return num_nodes * (64 if node_table_packed(num_nodes) else 512)


def mesh_table_bytes(num_nodes: int, num_tris: int) -> int:
    """Physical VMEM footprint of the pack_mesh tables (dense layout):
    nodes 512 B/node flat or 64 B/node once packed (node_table_packed);
    each tri table packs 8 triangles per 128-lane row -> 64 B/tri, two
    tables."""
    return node_table_bytes(num_nodes) + num_tris * 128
