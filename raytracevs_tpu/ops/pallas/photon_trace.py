"""Pallas TPU kernel for the photon bounce loop (PhotonTrace.hlsl analog).

The jnp photon wavefront (ops/photon.py `_trace_photons_jnp`) pays XLA
per-lane material gathers (`mat_color[slot]`) and per-op dispatch on a
[P]-lane batch every bounce — measured ~14 ms of the 18 ms photon pass at
the reference's 131,072-photon safe cap (scripts/probe_photon2.py). This
kernel runs the same four-bounce loop on [32,128] photon tiles with the
megakernel's static-loop closest hit (one-hot material selects, zero
gathers), VMEM-resident scene tables, and everything fused into one
launch.

Semantics: `_trace_photons_jnp` exactly — same emission inputs, same
per-(photon, depth) Russian-roulette seeding, same store-on-diffuse /
Fresnel-glass / roughness-lerped-metal rules (src/Shader/
PhotonTrace.hlsl:97-223). Photons ignore triangle meshes (the reference's
photon RTPSO has no triangle hit group), so the scene binds with
mesh=None. Equivalence: tests/test_megakernel.py
test_pallas_photon_trace_matches_jnp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from .megakernel import (
    F32, I32, U32, TILE_H, TILE_W,
    _bind_ks, _u24_to_f32, intersect_closest_k, pack_scene, pcg_hash_t,
    vadd, vdot, vlen, vscale, vsub, vwhere, vzeros,
)

_LANES = TILE_H * TILE_W  # photons per kernel program


def _wang_hash_t(seed):
    """WangHash (Common.hlsli:762-770) on a tile; bit-equal to
    sampling.wang_hash."""
    seed = seed.astype(U32)
    seed = (seed ^ U32(61)) ^ (seed >> U32(16))
    seed = seed * U32(9)
    seed = seed ^ (seed >> U32(4))
    seed = seed * U32(0x27D4EB2D)
    seed = seed ^ (seed >> U32(15))
    return seed


def _random_float_t(seed):
    """RandomFloat (Common.hlsli:833-837) on a tile; bit-equal to
    photon._random_float (pcg advance + top-24-bit mantissa)."""
    seed = pcg_hash_t(seed)
    return seed, _u24_to_f32(seed >> U32(8)) * F32(1.0 / 16777216.0)


def _photon_kernel(caps, sph, pln, box, mat, lts, fp, ip, pin, pout):
    kk = _bind_ks(caps, sph, pln, box, mat, lts, fp, ip, None)
    p = pin[:]
    o = (p[0], p[1], p[2])
    d = (p[3], p[4], p[5])
    color = (p[6], p[7], p[8])
    power = p[9]
    alive = p[10] > 0.5
    shape = power.shape

    # global photon index of each lane, supplied by the caller (channel 11,
    # f32-exact below 2^24 >> MAX_PHOTONS): under multi-chip photon
    # sharding each device traces a slice of the global batch, so the RR
    # seed key must be the global index, not the program-local one
    idx = p[11].astype(I32)

    store_mask = jnp.zeros(shape, bool)
    store_pos = vzeros(shape)
    store_dir = vzeros(shape)
    store_color = vzeros(shape)
    store_power = jnp.zeros(shape, F32)
    is_caustic = jnp.zeros(shape, bool)
    no_skip = jnp.full(shape, -99, I32)

    for depth in range(C.MAX_PHOTON_BOUNCES):
        hit = intersect_closest_k(kk, o, d, F32(C.RAY_TMIN), F32(C.RAY_TMAX),
                                  no_skip, no_skip)
        live_hit = alive & hit["hit"]
        pos = hit["pos"]
        normal = hit["n_out"]  # geometric outward (photon.py's convention)
        mat_rgb = hit["albedo"]
        metallic = hit["metallic"]
        transmission = hit["transmission"]
        roughness = hit["roughness"]
        ior = hit["ior"]

        # Russian roulette per (photon, depth) — photon.py seeding exactly
        rr_seed = _wang_hash_t(
            idx.astype(U32) * U32(9781) ^ (U32(depth) * U32(0x9E3779B9)))
        rr_seed, rr = _random_float_t(rr_seed)
        survival = jnp.clip(
            jnp.maximum(mat_rgb[0], jnp.maximum(mat_rgb[1], mat_rgb[2])),
            0.1, 0.95)
        survive = rr <= survival
        power = jnp.where(live_hit, power / survival, power)
        color = vwhere(live_hit,
                       (color[0] * mat_rgb[0], color[1] * mat_rgb[1],
                        color[2] * mat_rgb[2]), color)
        alive = alive & hit["hit"] & survive

        is_glass = transmission > 0.5
        is_metal = ~is_glass & (metallic > 0.5)
        is_diffuse = ~is_glass & ~is_metal

        # Diffuse: store if caustic, terminate (PhotonTrace.hlsl:117-128)
        store_now = alive & is_diffuse & is_caustic & ~store_mask
        store_mask = store_mask | store_now
        store_pos = vwhere(store_now, pos, store_pos)
        store_dir = vwhere(store_now, d, store_dir)
        store_color = vwhere(store_now, color, store_color)
        store_power = jnp.where(store_now, power, store_power)
        alive = alive & ~is_diffuse

        # Glass: probabilistic Fresnel reflect/refract (PhotonTrace.hlsl:
        # 129-190)
        view = vscale(d, -1.0)
        front2 = vdot(view, normal) > 0.0
        outward = vwhere(front2, normal, vscale(normal, -1.0))
        cos_theta = jnp.abs(vdot(view, outward))
        f0 = jnp.square((1.0 - ior) / (1.0 + ior))
        om = 1.0 - cos_theta
        om2 = om * om
        fresnel = f0 + (1.0 - f0) * (om2 * om2 * om)
        rr_seed, choice = _random_float_t(rr_seed)
        refracting = choice > fresnel
        eta = jnp.where(front2, 1.0 / ior, ior)
        cosi = -vdot(d, outward)
        sin2t = eta * eta * (1.0 - cosi * cosi)
        tir = sin2t > 1.0
        cost = jnp.sqrt(jnp.maximum(1.0 - sin2t, 0.0))
        k_r = eta * cosi - cost
        refr = vadd(vscale(d, eta), vscale(outward, k_r))
        refl = vsub(d, vscale(outward, 2.0 * vdot(d, outward)))
        refr_n = vscale(refr, 1.0 / jnp.maximum(vlen(refr), 1e-12))
        thru = refracting & ~tir
        glass_dir = vwhere(thru, refr_n, refl)
        glass_origin = vwhere(thru, vsub(pos, vscale(outward, 0.01)),
                              vadd(pos, vscale(outward, 0.01)))

        # Metal: roughness-lerped reflection (PhotonTrace.hlsl:191-223)
        refl_m = vsub(d, vscale(normal, 2.0 * vdot(d, normal)))
        rr_seed, hz = _random_float_t(rr_seed)
        rr_seed, hphi = _random_float_t(rr_seed)
        hz2 = hz * 2.0 - 1.0
        hr = jnp.sqrt(jnp.maximum(0.0, 1.0 - hz2 * hz2))
        ang = hphi * F32(6.28318530718)
        hemi = (hr * jnp.cos(ang), hr * jnp.sin(ang), hz2)
        hemi = vwhere(vdot(hemi, normal) > 0.0, hemi, vscale(hemi, -1.0))
        rough2 = roughness * roughness
        metal_dir = vadd(refl_m, vscale(vsub(hemi, refl_m), rough2))
        inv_len = 1.0 / jnp.maximum(vlen(metal_dir), 1e-12)
        metal_dir = vwhere(roughness > 0.01, vscale(metal_dir, inv_len),
                           refl_m)

        is_caustic = is_caustic | (alive & (is_glass | is_metal))
        o = vwhere(is_glass, glass_origin, vadd(pos, vscale(normal, 0.01)))
        d = vwhere(is_glass, glass_dir, metal_dir)

    pout[0, :, :] = store_pos[0]
    pout[1, :, :] = store_pos[1]
    pout[2, :, :] = store_pos[2]
    pout[3, :, :] = store_dir[0]
    pout[4, :, :] = store_dir[1]
    pout[5, :, :] = store_dir[2]
    pout[6, :, :] = store_color[0]
    pout[7, :, :] = store_color[1]
    pout[8, :, :] = store_color[2]
    pout[9, :, :] = store_power
    pout[10, :, :] = store_mask.astype(F32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_photons_pallas(scene, origin, direction, color, power, alive,
                         idx=None, interpret: bool = False):
    """Run the photon bounce loop on photon tiles.

    origin/direction/color [P,3], power [P], alive [P] bool; P must be a
    multiple of TILE_H*TILE_W (the caller falls back to the jnp loop
    otherwise). `idx` [P] i32 is each photon's GLOBAL batch index (the RR
    seed key; defaults to 0..P-1 for an unsharded batch). Returns
    (store_pos [P,3], store_dir [P,3], store_color [P,3], store_power [P],
    store_mask [P] bool).
    """
    n = origin.shape[0]
    assert n % _LANES == 0, n
    rows = n // TILE_W
    if idx is None:
        idx = jnp.arange(n, dtype=jnp.int32)

    sp = pack_scene(scene)
    caps = (sp.sph.shape[0], sp.pln.shape[0], sp.box.shape[0],
            sp.lts.shape[0])
    tables = (sp.sph, sp.pln, sp.box, sp.mat, sp.lts, sp.fparams, sp.iparams)

    def lanes(a):
        return a.reshape(rows, TILE_W)

    pin = jnp.stack(
        [lanes(origin[:, 0]), lanes(origin[:, 1]), lanes(origin[:, 2]),
         lanes(direction[:, 0]), lanes(direction[:, 1]), lanes(direction[:, 2]),
         lanes(color[:, 0]), lanes(color[:, 1]), lanes(color[:, 2]),
         lanes(power), lanes(alive.astype(F32)),
         lanes(idx.astype(F32))], axis=0)

    def table_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_photon_kernel, caps),
        out_shape=jax.ShapeDtypeStruct((11, rows, TILE_W), F32),
        grid=(rows // TILE_H,),
        in_specs=[table_spec(a) for a in tables]
        + [pl.BlockSpec((12, TILE_H, TILE_W), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((11, TILE_H, TILE_W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*tables, pin)

    def unlanes3(c0):
        return jnp.stack([out[c0].reshape(n), out[c0 + 1].reshape(n),
                          out[c0 + 2].reshape(n)], axis=-1)

    return (unlanes3(0), unlanes3(3), unlanes3(6), out[9].reshape(n),
            out[10].reshape(n) > 0.5)
