"""Pallas photon-gather kernel: per-pixel caustic estimation on TPU.

The portable gather (ops/photon.py::gather) replicates the reference's
19-cell spatial-hash walk (Common.hlsli:887-967) with per-pixel dynamic
indexing — XLA lowers that to millions of small gathers, ~6 s/frame at
1080p on a v5e. This kernel reformulates it TPU-first: photons are sorted
by the Morton code of their hash cell (spatially coherent), the whole
table lives in VMEM, and each 32x128 pixel tile scans photon *chunks* of
64, skipping any chunk whose bounding box (dilated by the gather radius)
misses every lane. Within the radius it accumulates the same Gaussian
kernel exp(-d^2/r^2) * max(dot(-photon_dir, N), 0) and respects the
32-photon accept cap (MAX_GATHER_PHOTONS_THRESHOLD); the *subset* kept
when the cap binds follows Morton order instead of the reference's cell
walk, which only matters in overdense foci where both estimates saturate.
Two further deliberate deviations from the hash-walk (both make this the
*more* correct estimator): corner-diagonal photons culled by the walk's
cellDistSq<=2 test are accepted when inside the radius, and photons the
walk double-counts through hash-slot collisions are counted once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C

F32 = jnp.float32
I32 = jnp.int32

TILE_H = 32
TILE_W = 128
CHUNK = 64


def _morton10(v):
    """Dilate 10 bits: abcdefghij -> a00b00c00...; v in [0, 1023]."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def pack_photons(pmap):
    """Morton-sort the photon table and build chunk bounding boxes.

    Returns (ph_tbl [P,12], bbox_tbl [P/CHUNK, 8], n_chunks).
    ph row: pos3, dir3, col3, power, valid, pad. Invalid photons get a
    far-away position so chunk bboxes and distance tests exclude them.
    """
    p = pmap.position.shape[0]
    assert p % CHUNK == 0, "photon budget must be a multiple of 64"
    cell_size = jnp.maximum(pmap.radius * 2.0, 1e-4)
    cell = jnp.floor(pmap.position / cell_size).astype(I32) + 512
    cell = jnp.clip(cell, 0, 1023)
    code = (
        _morton10(cell[:, 0]) | (_morton10(cell[:, 1]) << 1) | (_morton10(cell[:, 2]) << 2)
    )
    code = jnp.where(pmap.valid & (jnp.arange(p) < pmap.count), code, jnp.int32(2**30))
    order = jnp.argsort(code)
    valid = (pmap.valid & (jnp.arange(p) < pmap.count))[order]
    far = F32(1e8)
    pos = jnp.where(valid[:, None], pmap.position[order], far)
    tbl = jnp.zeros((p, 12), F32)
    tbl = (
        tbl.at[:, 0:3].set(pos)
        .at[:, 3:6].set(pmap.direction[order])
        .at[:, 6:9].set(pmap.color[order])
        .at[:, 9].set(jnp.where(valid, pmap.power[order], 0.0))
        .at[:, 10].set(valid.astype(F32))
    )
    n_chunks = p // CHUNK
    cpos = pos.reshape(n_chunks, CHUNK, 3)
    bbox = jnp.zeros((n_chunks, 8), F32)
    bbox = bbox.at[:, 0:3].set(jnp.min(cpos, axis=1)).at[:, 3:6].set(jnp.max(cpos, axis=1))
    return tbl, bbox, n_chunks


def _make_kernel(n_chunks: int, radius: float, intensity: float):
    r2 = float(radius) * float(radius)
    max_gather = C.MAX_GATHER_PHOTONS_THRESHOLD

    def kernel(px_ref, ph_ref, bb_ref, out_ref):
        pos = (px_ref[0], px_ref[1], px_ref[2])
        nrm = (px_ref[3], px_ref[4], px_ref[5])
        elig_i = (px_ref[6] > 0.5).astype(I32)
        zero = pos[0] * 0.0
        izero = zero.astype(I32)

        def chunk_body(c, carry):
            cr, cg, cb, wsum, cnt = carry
            bb = bb_ref[pl.ds(c, 1), :]
            near = (
                (elig_i != 0)
                & (cnt < max_gather)
                & (pos[0] >= bb[0, 0] - r2 ** 0.5) & (pos[0] <= bb[0, 3] + r2 ** 0.5)
                & (pos[1] >= bb[0, 1] - r2 ** 0.5) & (pos[1] <= bb[0, 4] + r2 ** 0.5)
                & (pos[2] >= bb[0, 2] - r2 ** 0.5) & (pos[2] <= bb[0, 5] + r2 ** 0.5)
            )
            near_i = near.astype(I32)  # i1 can't cross the cond region

            def scan_chunk(carry):
                cr, cg, cb, wsum, cnt = carry

                def photon_body(k, inner):
                    cr, cg, cb, wsum, cnt = inner
                    row = ph_ref[pl.ds(c * CHUNK + k, 1), :]
                    dx = pos[0] - row[0, 0]
                    dy = pos[1] - row[0, 1]
                    dz = pos[2] - row[0, 2]
                    d2 = dx * dx + dy * dy + dz * dz
                    dot_n = -(row[0, 3] * nrm[0] + row[0, 4] * nrm[1] + row[0, 5] * nrm[2])
                    accept = (
                        (near_i != 0) & (row[0, 10] > 0.5) & (d2 < r2)
                        & (dot_n > 0.0) & (cnt < max_gather)
                    )
                    w = jnp.exp(-d2 / F32(r2)) * dot_n
                    pw = row[0, 9] * w
                    cr = jnp.where(accept, cr + row[0, 6] * pw, cr)
                    cg = jnp.where(accept, cg + row[0, 7] * pw, cg)
                    cb = jnp.where(accept, cb + row[0, 8] * pw, cb)
                    wsum = jnp.where(accept, wsum + w, wsum)
                    cnt = cnt + accept.astype(I32)
                    return cr, cg, cb, wsum, cnt

                return jax.lax.fori_loop(0, CHUNK, photon_body, carry)

            return jax.lax.cond(jnp.any(near), scan_chunk, lambda x: x,
                                (cr, cg, cb, wsum, cnt))

        init = (zero, zero, zero, zero, izero)
        cr, cg, cb, wsum, _cnt = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        area = F32(3.14159265) * F32(r2)
        hasw = wsum > 0.0
        scale = F32(intensity) / area
        out_ref[0, :, :] = jnp.where(hasw, cr * scale, 0.0)
        out_ref[1, :, :] = jnp.where(hasw, cg * scale, 0.0)
        out_ref[2, :, :] = jnp.where(hasw, cb * scale, 0.0)

    return kernel


def _cdiv(a, b):
    return -(-a // b)


def gather_pallas(pmap, position, normal, eligible, height: int, width: int,
                  interpret: bool = False):
    """Gather caustics for [N,3] positions laid out as a height x width
    image. Returns caustic [N,3] (zero on non-eligible lanes)."""
    tbl, bbox, n_chunks = pack_photons(pmap)
    hp = _cdiv(height, TILE_H) * TILE_H
    wp = _cdiv(width, TILE_W) * TILE_W
    px = jnp.zeros((8, hp, wp), F32)
    img = lambda a: a.reshape(height, width)  # noqa: E731
    px = (
        px.at[0, :height, :width].set(img(position[:, 0]))
        .at[1, :height, :width].set(img(position[:, 1]))
        .at[2, :height, :width].set(img(position[:, 2]))
        .at[3, :height, :width].set(img(normal[:, 0]))
        .at[4, :height, :width].set(img(normal[:, 1]))
        .at[5, :height, :width].set(img(normal[:, 2]))
        .at[6, :height, :width].set(img(eligible.astype(F32)))
    )
    grid = (hp // TILE_H, wp // TILE_W)

    def table_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(n_chunks, 0.5, 3.0),  # DXRPipeline.h:484-485
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), F32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            table_spec(tbl), table_spec(bbox),
        ],
        out_specs=pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(px, tbl, bbox)
    out = out[:, :height, :width]
    n = height * width
    return jnp.stack([out[0].reshape(n), out[1].reshape(n), out[2].reshape(n)], axis=-1)
