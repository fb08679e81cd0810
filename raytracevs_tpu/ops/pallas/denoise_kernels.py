"""Pallas TPU kernels for the denoiser's hot stages.

The denoiser's cost on TPU is dominated by XLA per-lane gathers: motion
reprojection alone measured ~220 ms at 1080p (4 fused 16-channel gathers at
2M lanes run at element rate on the scalar path). These kernels reformulate
the stages gather-free:

- `reproject_accumulate`: tile-quantized motion reprojection. Each (TH,TW)
  tile takes its mean motion vector; history is fetched as a 2x2 block
  window selected by scalar-prefetched block indices (the standard Pallas
  dynamic-block trick), and the subpixel part becomes a tile-uniform
  bilinear blend of four statically-shifted slices. Pixels whose motion
  deviates from the tile mean by more than RESIDUAL_LIMIT px reject history
  (accumulation restarts), exactly like a failed NRD occlusion test. For
  uniform motion fields — camera pans, the dominant case — this is
  bit-exact bilinear reprojection at memory-bound speed.

- `spatial_filters`: the 3-pass edge-stopping a-trous over diffuse+specular
  and the ShadowDenoise.hlsl 5x5 shadow filter (exact object-ID + depth +
  normal^8 + Gaussian weights), fused into one halo-windowed stencil kernel
  per pass. XLA's roll-based formulation re-materializes the frame per tap;
  here each pass streams a 3x3 block neighborhood through VMEM once.

Semantic contract: matches post/denoise.py's jnp implementations (the
oracle) except at reprojection sites with non-uniform sub-tile motion,
where history is dropped rather than bilinearly warped per pixel.
Equivalence is tested in interpreter mode (tests/test_denoise_kernels.py).

Reference semantics: NRDDenoiser.cpp:774-1280 (REBLUR temporal + history
reset), src/Shader/ShadowDenoise.hlsl:39-131.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C

F32 = jnp.float32
I32 = jnp.int32

# Packed history-state channel layout (channel-first [16, H, W]):
# 0:4 diffuse slow history (rgb + hitdist), 4:8 specular slow history,
# 8:11 fast diffuse, 11:14 fast specular, 14 frames, 15 view_z.
STATE_CH = 16
# Current-frame packed inputs [8, H, W]: diffuse4 + specular4.
CURR_CH = 8

MAX_ACCUM_FRAMES = 16.0  # NRDDenoiser.cpp:870
MAX_FAST_FRAMES = 4.0  # NRDDenoiser.cpp:871
RESIDUAL_LIMIT = 0.75  # px deviation from the tile-mean motion
# responsive accumulation for near-mirrors (NRDDenoiser.cpp:864-865);
# must mirror post/denoise.py's flag so the kernel and the jnp oracle
# stay in lockstep
_RESPONSIVE = os.environ.get("RTVS_RESPONSIVE_ACCUM", "1") == "1"
_RESPONSIVE_ROUGHNESS = 0.05  # NRDDenoiser.cpp:864
# specular virtual-motion reprojection (see post/denoise.SPEC_VIRTUAL);
# adds a second 2x2 window fetch (7 spec channels) steered by the
# virtual-motion field's own tile stats
_SPEC_VIRTUAL = os.environ.get("RTVS_SPEC_VIRTUAL", "1") == "1"


def reproject_tile_rows() -> int:
    """Configured reproject tile height (RTVS_REPROJ_TH). The sharded CF
    path sizes its temporal halo to a multiple of this (post/denoise.py
    _temporal_halo_cf) so halo rows tile exactly."""
    return int(os.environ.get("RTVS_REPROJ_TH", "8"))


def _tile_sizes(height: int, width: int):
    # Tile = the motion-quantization granule AND the DMA granule. Bigger
    # tiles halve the program/DMA count (the kernel reads a 2x2 block
    # window = 4x the state per program regardless of size) at the cost
    # of coarser tile-mean motion.
    th = reproject_tile_rows()
    tw = 384 if width % 384 == 0 else 128
    if height % th or width % tw or height < 2 * th or width < 2 * tw:
        return None
    return th, tw


def reproject_supported(height: int, width: int) -> bool:
    return _tile_sizes(height, width) is not None


# packed scalar-prefetch rows (one i32 + one f32 operand — separate 2-D
# SMEM operands get lane-padded to 128 wide and blow the 1 MB SMEM budget)
_PI_BY0, _PI_BY1, _PI_BX0, _PI_BX1, _PI_SUBY, _PI_SUBX = range(6)
_PF_FY, _PF_FX, _PF_OK, _PF_OFFY, _PF_OFFX, _PF_ROW0 = range(6)
# second row set (offset by 6): the virtual-motion field's tile stats,
# present only when the kernel is built with spec_virtual=True


def _reproject_kernel(th, tw, global_h, width, ntx, spec_virtual,
                      # scalar prefetch refs: ints [6|12, n_tiles],
                      # floats [6|11, n_tiles]
                      pi, pf,
                      # tensor refs (v00..v11 only when spec_virtual)
                      *refs):
    if spec_virtual:
        (h00, h01, h10, h11, v00, v01, v10, v11,
         curr, motion, motion_spec, vz, out) = refs
    else:
        h00, h01, h10, h11, curr, motion, vz, out = refs
        motion_spec = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * ntx + j

    # 2x2 block window -> [16, 2TH, 2TW]; the sub-block offset becomes a
    # dynamic ROTATE so the bilinear taps are static slices (Mosaic rejects
    # unaligned dynamic sublane slices but rotates are native)
    # history may be stored at half precision (RTVS_STATE_DTYPE) — compute
    # always runs f32; the cast rides the load
    win_v = jnp.concatenate(
        [jnp.concatenate([h00[:], h01[:]], axis=2),
         jnp.concatenate([h10[:], h11[:]], axis=2)],
        axis=1,
    ).astype(F32)
    sy = pi[_PI_SUBY, t]
    sx = pi[_PI_SUBX, t]
    fy = pf[_PF_FY, t]
    fx = pf[_PF_FX, t]
    win_v = pltpu.roll(win_v, (2 * th - sy) % (2 * th), axis=1)
    win_v = pltpu.roll(win_v, (2 * tw - sx) % (2 * tw), axis=2)

    def tap(dy, dx):
        # rows sy+dy..sy+dy+th-1 of the original window; no wraparound is
        # read because sy <= th-1 and dy, dx <= 1
        return win_v[:, dy : th + dy, dx : tw + dx]

    hist = (
        tap(0, 0) * ((1.0 - fy) * (1.0 - fx))
        + tap(0, 1) * ((1.0 - fy) * fx)
        + tap(1, 0) * (fy * (1.0 - fx))
        + tap(1, 1) * (fy * fx)
    )

    hist_d = hist[0:4]
    hist_s = hist[4:8]
    fast_d = hist[8:11]
    fast_s = hist[11:14]
    hist_frames = hist[14]
    hist_z = hist[15]

    cur = curr[:]
    curr_d = cur[0:4]
    curr_s = cur[4:8]
    mv = motion[:]
    z = vz[0]
    rough = vz[1]

    rows = jax.lax.broadcasted_iota(I32, (th, tw), 0) + i * th
    cols = jax.lax.broadcasted_iota(I32, (th, tw), 1) + j * tw

    if spec_virtual:
        # virtual-motion spec window: same 2x2-block/rotate machinery,
        # steered by the virtual field's own tile stats (prefetch rows
        # 6..); 7 channels (spec4 + fast_spec3) from the spec-contiguous
        # shadow copy of the state
        win2 = jnp.concatenate(
            [jnp.concatenate([v00[:], v01[:]], axis=2),
             jnp.concatenate([v10[:], v11[:]], axis=2)],
            axis=1,
        ).astype(F32)
        sy2 = pi[_PI_SUBY + 6, t]
        sx2 = pi[_PI_SUBX + 6, t]
        fy2 = pf[_PF_FY + 6, t]
        fx2 = pf[_PF_FX + 6, t]
        win2 = pltpu.roll(win2, (2 * th - sy2) % (2 * th), axis=1)
        win2 = pltpu.roll(win2, (2 * tw - sx2) % (2 * tw), axis=2)

        def tap2(dy, dx):
            return win2[:, dy : th + dy, dx : tw + dx]

        hv = (
            tap2(0, 0) * ((1.0 - fy2) * (1.0 - fx2))
            + tap2(0, 1) * ((1.0 - fy2) * fx2)
            + tap2(1, 0) * (fy2 * (1.0 - fx2))
            + tap2(1, 1) * (fy2 * fx2)
        )
        mvs = motion_spec[:]
        prev_y2 = rows.astype(F32) + pf[_PF_ROW0, t] - mvs[1]
        prev_x2 = cols.astype(F32) - mvs[0]
        in2 = (
            (prev_x2 >= 0.0) & (prev_x2 <= width - 1.0)
            & (prev_y2 >= 0.0) & (prev_y2 <= global_h - 1.0)
        )
        res2 = (
            (jnp.abs(mvs[1] - pf[_PF_OFFY + 6, t]) <= RESIDUAL_LIMIT)
            & (jnp.abs(mvs[0] - pf[_PF_OFFX + 6, t]) <= RESIDUAL_LIMIT)
        )
        virt_ok = (pf[_PF_OK + 6, t] > 0.5) & in2 & res2
        hist_s = jnp.where(virt_ok[None], hv[0:4], hist_s)
        fast_s = jnp.where(virt_ok[None], hv[4:7], fast_s)

    # Per-pixel validity: window not frame-clamped, previous position
    # in-frame, motion within RESIDUAL_LIMIT of the tile mean, depth
    # consistent, not sky (same predicate set as the jnp oracle).
    # rows are GLOBAL image coordinates: in a sharded slab (row_offset !=
    # 0) the bounds test must use the whole-frame extent so shard results
    # equal the single-device kernel's at every kept row.
    off_y = pf[_PF_OFFY, t]  # tile-mean motion (f32)
    off_x = pf[_PF_OFFX, t]
    prev_y = rows.astype(F32) + pf[_PF_ROW0, t] - mv[1]
    prev_x = cols.astype(F32) - mv[0]
    in_bounds = (
        (prev_x >= 0.0) & (prev_x <= width - 1.0)
        & (prev_y >= 0.0) & (prev_y <= global_h - 1.0)
    )
    res_ok = (
        (jnp.abs(mv[1] - off_y) <= RESIDUAL_LIMIT)
        & (jnp.abs(mv[0] - off_x) <= RESIDUAL_LIMIT)
    )
    depth_ok = jnp.abs(hist_z - z) <= 0.1 * jnp.maximum(z, C.VIEWZ_MIN)
    not_sky = z < C.VIEWZ_SKY * 0.99
    valid = (pf[_PF_OK, t] > 0.5) & in_bounds & res_ok & depth_ok & not_sky

    frames = jnp.where(valid, jnp.minimum(hist_frames + 1.0, MAX_ACCUM_FRAMES), 0.0)
    alpha = 1.0 / (1.0 + frames)
    fast_frames = jnp.minimum(frames, MAX_FAST_FRAMES)
    fast_alpha = 1.0 / (1.0 + fast_frames)

    alpha_s = alpha
    if _RESPONSIVE:
        # responsive accumulation: near-mirror specular uses the FAST cap
        # (rough arrives as 1.0 when the caller passes no roughness, so
        # the predicate never fires — legacy behavior preserved)
        frames_s = jnp.where(rough < _RESPONSIVE_ROUGHNESS,
                             fast_frames, frames)
        alpha_s = 1.0 / (1.0 + frames_s)

    acc_d = hist_d + (curr_d - hist_d) * alpha[None]
    acc_s = hist_s + (curr_s - hist_s) * alpha_s[None]
    new_fast_d = fast_d + (curr_d[0:3] - fast_d) * fast_alpha[None]
    new_fast_s = fast_s + (curr_s[0:3] - fast_s) * fast_alpha[None]

    # REBLUR-style anti-lag clamp of the slow history to the fast history
    def clamp_to_fast(slow, fast):
        lo = fast * 0.5
        hi = fast * 2.0 + 1e-3
        return jnp.clip(slow, jnp.minimum(lo, hi), jnp.maximum(lo, hi))

    acc_d = jnp.concatenate([clamp_to_fast(acc_d[0:3], new_fast_d), acc_d[3:4]], axis=0)
    acc_s = jnp.concatenate([clamp_to_fast(acc_s[0:3], new_fast_s), acc_s[3:4]], axis=0)

    out[:] = jnp.concatenate(
        [acc_d, acc_s, new_fast_d, new_fast_s, frames[None], z[None]], axis=0
    ).astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "global_h"))
def reproject_accumulate(packed_state, curr, motion, view_z, interpret: bool = False,
                         row_offset=0, global_h: int = None, roughness=None,
                         motion_spec=None):
    """Tile-quantized temporal reprojection + accumulation.

    packed_state [16,H,W] (STATE_CH layout), curr [8,H,W] (diffuse4 +
    specular4), motion [2,H,W] pixel-space (current - previous),
    view_z [H,W]. `roughness` [H,W] (optional) enables responsive
    accumulation for near-mirror specular (NRDDenoiser.cpp:864-865) —
    omitted, the kernel behaves exactly as before.
    Returns the new packed state [16,H,W] in
    packed_state's dtype: history may be STORED at half precision
    (post/denoise.STATE_DTYPE; the reference's NRD history pools are
    fp16 — NRDDenoiser.cpp resource formats), which halves the HBM
    traffic of this bandwidth-bound kernel (4 window reads + pad copy +
    state write scale with state bytes). Compute is always f32.

    Sharded slabs (post/denoise.py denoise_frame_sharded_cf) pass the
    halo-extended state with `row_offset` = the slab's first GLOBAL image
    row (may be traced) and `global_h` = the whole-frame height, so the
    in-bounds predicate matches the single-device kernel exactly; the
    slab-local window addressing is unchanged (TEMPORAL_HALO covers the
    MV clamp, so any in-bounds history row is inside the slab).
    """
    _, height, width = packed_state.shape
    if global_h is None:
        global_h = height
    sizes = _tile_sizes(height, width)
    assert sizes is not None, (height, width)
    th, tw = sizes
    nty, ntx = height // th, width // tw

    # History is edge-padded by one block per side: bilinear partners of
    # valid border pixels then read replicated edge values (exactly the
    # oracle's clamped taps), and any window that would still fall outside
    # the padded frame implies every lane's previous position is
    # out-of-frame — so the whole-tile invalid flag is exact, not lossy.
    padded = jnp.pad(packed_state, ((0, 0), (th, th), (tw, tw)), mode="edge")

    def tile_stats(mfield):
        """Per-tile mean motion and derived block/subpixel addressing:
        ([6,n] i32 block/sub rows, [5,n] f32 fy/fx/ok/offy/offx rows)."""
        m = mfield.reshape(2, nty, th, ntx, tw)
        off = m.mean(axis=(2, 4))  # [2, nty, ntx] (x, y)
        base_y = (jnp.arange(nty, dtype=F32) * th)[None, :, None]
        base_x = (jnp.arange(ntx, dtype=F32) * tw)[None, None, :]
        gy_f = base_y - off[1:2]
        gx_f = base_x - off[0:1]
        gy = jnp.floor(gy_f[0])
        gx = jnp.floor(gx_f[0])
        fy = (gy_f[0] - gy).astype(F32)
        fx = (gx_f[0] - gx).astype(F32)
        gy_i = gy.astype(I32)
        gx_i = gx.astype(I32)
        gy_c = jnp.clip(gy_i, -th, height - 1)
        gx_c = jnp.clip(gx_i, -tw, width - 1)
        ok = ((gy_i == gy_c) & (gx_i == gx_c)).astype(F32)
        # block/sub addressing in PADDED coordinates
        by_lo = (gy_c + th) // th
        bx_lo = (gx_c + tw) // tw
        by1 = jnp.minimum(by_lo + 1, nty + 1)
        bx1 = jnp.minimum(bx_lo + 1, ntx + 1)
        pi_rows = jnp.stack(
            [by_lo.reshape(-1), by1.reshape(-1), bx_lo.reshape(-1),
             bx1.reshape(-1), (gy_c + th - by_lo * th).reshape(-1),
             (gx_c + tw - bx_lo * tw).reshape(-1)],
            axis=0,
        ).astype(I32)
        pf_rows = jnp.stack(
            [fy.reshape(-1), fx.reshape(-1), ok.reshape(-1),
             off[1].reshape(-1), off[0].reshape(-1)],
            axis=0,
        ).astype(F32)
        return pi_rows, pf_rows

    spec_virtual = motion_spec is not None and _SPEC_VIRTUAL
    pi, pf5 = tile_stats(motion)
    row0_row = jnp.full((1, nty * ntx), row_offset, F32)
    pf = jnp.concatenate([pf5, row0_row], axis=0)
    if spec_virtual:
        pi2, pf2 = tile_stats(motion_spec)
        pi = jnp.concatenate([pi, pi2], axis=0)
        pf = jnp.concatenate([pf, pf2], axis=0)
        # spec-contiguous shadow copy of the state for the 7-channel
        # virtual windows (spec4 + fast_spec3); its own edge pad
        spec_padded = jnp.pad(
            jnp.concatenate([packed_state[4:8], packed_state[11:14]],
                            axis=0),
            ((0, 0), (th, th), (tw, tw)), mode="edge")

    def hist_spec(sel_y, sel_x, base=0, nch=STATE_CH):
        row_y = (_PI_BY1 if sel_y else _PI_BY0) + base
        row_x = (_PI_BX1 if sel_x else _PI_BX0) + base

        def index_map(i, j, pi_r, pf_r):
            t = i * ntx + j
            return (0, pi_r[row_y, t], pi_r[row_x, t])

        return pl.BlockSpec((nch, th, tw), index_map)

    def blk(ch):
        return pl.BlockSpec(
            (ch, th, tw), lambda i, j, *_: (0, i, j)
        )

    in_specs = [
        hist_spec(0, 0), hist_spec(0, 1), hist_spec(1, 0), hist_spec(1, 1)]
    operands = [padded, padded, padded, padded]
    if spec_virtual:
        in_specs += [hist_spec(0, 0, 6, 7), hist_spec(0, 1, 6, 7),
                     hist_spec(1, 0, 6, 7), hist_spec(1, 1, 6, 7)]
        operands += [spec_padded, spec_padded, spec_padded, spec_padded]
    in_specs += [blk(CURR_CH), blk(2)]
    operands += [curr, motion]
    if spec_virtual:
        in_specs += [blk(2)]
        operands += [motion_spec]
    in_specs += [blk(2)]
    if roughness is None:
        # rough = 1.0 keeps the responsive predicate permanently false
        roughness = jnp.ones_like(view_z)
    operands += [jnp.stack([view_z, roughness], axis=0)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=in_specs,
        out_specs=blk(STATE_CH),
    )
    kernel = functools.partial(_reproject_kernel, th, tw, global_h, width,
                               ntx, spec_virtual)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((STATE_CH, height, width),
                                       packed_state.dtype),
        interpret=interpret,
    )(pi, pf, *operands)


# ---------------------------------------------------------------------------
# Halo-windowed stencil kernels: a-trous + shadow filter
# ---------------------------------------------------------------------------
def _stencil_sizes(height: int, width: int, halo: int,
                   budget: int = 15_500_000, bpe: int = 440):
    # full-width row bands: per-program DMA count is the stencil's cost on
    # TPU (compute is trivial), so fetch 3 bands instead of 9 tiles.
    # The 3-band window's VMEM footprint scales with th*(width+2*padx);
    # measured anchors (bytes-per-element `bpe`): the per-pass kernel
    # allocates 440*th*wp (th=16 at 2560-wide OOMs the default 16 MB
    # scoped limit -> th=8 bands), the fused 3-pass kernel ~1030*th*wp.
    # Callers that raise the per-kernel scoped-VMEM cap (vmem_limit_bytes)
    # pass the matching larger `budget` and keep 16-row bands at 4K.
    if width % 128:
        return None
    wp = width + 2 * _STENCIL_PADX
    for th in (16, 8):
        if height % th or height < 2 * th or halo > th:
            continue
        if bpe * th * wp <= budget:
            return th, width
    return None


def _shift_clamp(a, dy, dx):
    """Edge-clamped shifted view of [..., R, W]: element (r, c) reads
    (clamp(r+dy), clamp(c+dx)) — the texture-load semantics of the jnp
    oracle, applied at the WINDOW border (where values are either correct
    frame pads or inside the pollution margin that gets fixed up/cropped)."""
    if dy > 0:
        edge = jnp.broadcast_to(a[..., -1:, :], a.shape[:-2] + (dy, a.shape[-1]))
        a = jnp.concatenate([a[..., dy:, :], edge], axis=-2)
    elif dy < 0:
        edge = jnp.broadcast_to(a[..., :1, :], a.shape[:-2] + (-dy, a.shape[-1]))
        a = jnp.concatenate([edge, a[..., :dy, :]], axis=-2)
    if dx > 0:
        edge = jnp.broadcast_to(a[..., -1:], a.shape[:-1] + (dx,))
        a = jnp.concatenate([a[..., dx:], edge], axis=-1)
    elif dx < 0:
        edge = jnp.broadcast_to(a[..., :1], a.shape[:-1] + (-dx,))
        a = jnp.concatenate([edge, a[..., :dx]], axis=-1)
    return a


def _ff_lum(x):
    return x[0] * 0.2126 + x[1] * 0.7152 + x[2] * 0.0722


def _firefly_rows(img, lo, hi):
    """Anti-firefly clamp (REBLUR enableAntiFirefly, NRDDenoiser.cpp:859)
    over window rows lo..hi of a [6, R, wp] image: each pixel's luminance
    is clamped to its 8-neighbor max, per 3-channel group. Needs raw rows
    lo-1..hi+1; horizontal edges clamp via _shift_clamp (the window is
    edge-padded horizontally by _windowed_call)."""
    rows = hi - lo
    groups = []
    for g0 in (0, 3):
        grp = img[g0:g0 + 3]
        c = grp[:, lo:hi]
        lc = _ff_lum(c)
        m = None
        for dy in (-1, 0, 1):
            band = grp[:, lo + dy:hi + dy]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                q = _ff_lum(_shift_clamp(band, 0, dx))
                m = q if m is None else jnp.maximum(m, q)
        scale = jnp.minimum(1.0, m / jnp.maximum(lc, 1e-6))
        groups.append(c * scale[None])
    del rows
    return jnp.concatenate(groups, axis=0)


def _atrous_fused_kernel(th, padx, w, passes, nch, win, out_ref,
                         has_guide=False, firefly=False):
    """ALL a-trous passes in one 3-band window — one DMA set instead of
    one per pass (the stencils are DMA-bound, so this is ~passes x fewer
    fetches and launches).

    Compute diet (measured 11.3 -> 7.8 ms at 4K, scripts/probe_denoise_ops):
    pass p only needs rows within need_p = sum(strides p+1..) of the output
    band (strides 1,2,4 -> extents of 28/24/16 rows at th=16 instead of
    3*th per pass), and the per-tap depth-weight divide is hoisted to one
    center-row reciprocal (center vz is the divide's operand in the oracle,
    so hoisting is exact).

    Exactness: pass p is correct on rows/cols within m_p = sum(strides
    1..p) <= 7 of real data; the shrinking extents keep the output band
    inside every pass's exact region (needs th >= 8). Frame edges are
    EXACT, not approximate: after each pass the pad rows/cols within the
    NEXT pass's reach are overwritten with the broadcast boundary row/col
    of that pass's output, which is precisely what the oracle's
    edge-clamped reads see on the next pass.
    """
    img = win[0:nch]
    vz = win[nch]
    nrm = win[nch + 1 : nch + 4]
    i = pl.program_id(0)
    nty = pl.num_programs(0)
    wp = w + 2 * padx
    kernel_w = {0: 1.0, 1: 2.0 / 3.0, 2: 1.0 / 6.0}
    inv_vz = 1.0 / (0.05 * jnp.maximum(vz, C.VIEWZ_MIN))

    strides = [1 << p for p in range(passes)]
    need = [sum(strides[p + 1 :]) for p in range(passes)]
    exts = [(th - n, 2 * th + n) for n in need]
    if firefly:
        # Clamp fireflies on pass 0's extent +1 row each side (so pass 0's
        # stride-1 taps read clamped rows); raw rows a0-2..b0+2 are in the
        # window for th >= 8 (8 - 6 - 2 = 0).
        a0, b0 = exts[0]
        cur = _firefly_rows(img, a0 - 1, b0 + 1)
        cur_off = a0 - 1
    else:
        cur = img
        cur_off = 0  # window row index of cur's row 0
    if has_guide:
        gd = win[nch + 4]
        gs = win[nch + 5]
    for p in range(passes):
        s = strides[p]
        a, b = exts[p]
        rows = b - a
        c_img = cur[:, a - cur_off : b - cur_off]
        c_vz = vz[a:b]
        c_n = nrm[:, a:b]
        c_inv = inv_vz[a:b]
        if has_guide:
            s2 = float(s * s)
            g_d = jnp.exp(-s2 / jnp.square(jnp.maximum(gd[a:b], 1e-3)))
            g_s = jnp.exp(-s2 / jnp.square(jnp.maximum(gs[a:b], 1e-3)))
            acc_d = c_img[0:3]
            acc_s = c_img[3:6]
            wsum_d = jnp.ones((rows, wp), F32)
            wsum_s = jnp.ones((rows, wp), F32)
        else:
            acc = c_img
            wsum = jnp.ones((rows, wp), F32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ry = a - cur_off + dy * s
                q = _shift_clamp(cur[:, ry : ry + rows], 0, dx * s)
                qz = _shift_clamp(vz[a + dy * s : b + dy * s], 0, dx * s)
                qn = _shift_clamp(nrm[:, a + dy * s : b + dy * s], 0, dx * s)
                w_depth = jnp.exp(-jnp.abs(qz - c_vz) * c_inv)
                ndot = jnp.maximum((qn * c_n).sum(axis=0), 0.0)
                wq = w_depth * ndot ** 8 * kernel_w[max(abs(dy), abs(dx))]
                if has_guide:
                    wq_d = wq * g_d
                    wq_s = wq * g_s
                    acc_d = acc_d + q[0:3] * wq_d[None]
                    acc_s = acc_s + q[3:6] * wq_s[None]
                    wsum_d = wsum_d + wq_d
                    wsum_s = wsum_s + wq_s
                else:
                    acc = acc + q * wq[None]
                    wsum = wsum + wq
        if has_guide:
            cur = jnp.concatenate(
                [acc_d * (1.0 / wsum_d)[None], acc_s * (1.0 / wsum_s)[None]],
                axis=0)
        else:
            cur = acc * (1.0 / wsum)[None]
        cur_off = a
        if p == passes - 1:
            break
        # Re-establish the frame-edge pads from THIS pass's output so the
        # next pass's clamped reads match the whole-frame filter exactly.
        rtop = th - cur_off        # index of frame row 0 in cur
        rbot = 2 * th - 1 - cur_off
        top_fix = jnp.concatenate(
            [jnp.broadcast_to(cur[:, rtop : rtop + 1], (nch, rtop, wp)),
             cur[:, rtop:]], axis=1)
        cur = jnp.where(i == 0, top_fix, cur)
        bot_fix = jnp.concatenate(
            [cur[:, : rbot + 1],
             jnp.broadcast_to(cur[:, rbot : rbot + 1],
                              (nch, cur.shape[1] - rbot - 1, wp))], axis=1)
        cur = jnp.where(i == nty - 1, bot_fix, cur)
        left = jnp.broadcast_to(cur[..., padx : padx + 1],
                                cur.shape[:-1] + (padx,))
        right = jnp.broadcast_to(cur[..., padx + w - 1 : padx + w],
                                 cur.shape[:-1] + (padx,))
        cur = jnp.concatenate([left, cur[..., padx : padx + w], right],
                              axis=-1)
    out_ref[:] = cur[:, th - cur_off : 2 * th - cur_off, padx : padx + w]


def _atrous_pass_kernel(th, padx, w, stride, nch, win, out_ref,
                        has_guide=False, firefly=False):
    """One a-trous pass on a 3-band row window [C, 3*th, w + 2*padx].

    win channels: 0:nch filtered image, nch view_z, nch+1:nch+4 normal,
    [nch+4:nch+6 REBLUR guide radii when has_guide]. `firefly` clamps the
    pass input (stride-1 pass of the unfused/sharded chain) — same
    semantics as the fused kernel's head clamp.
    """
    img = win[0:nch]
    vz = win[nch]
    nrm = win[nch + 1 : nch + 4]
    if firefly:
        src = _firefly_rows(img, th - stride, 2 * th + stride)
        off = th - stride
    else:
        src = img
        off = 0

    c_img = src[:, th - off : 2 * th - off, padx : padx + w]
    c_vz = vz[th : 2 * th, padx : padx + w]
    c_n = nrm[:, th : 2 * th, padx : padx + w]

    if has_guide:
        s2 = float(stride * stride)
        g_d = jnp.exp(-s2 / jnp.square(jnp.maximum(
            win[nch + 4][th : 2 * th, padx : padx + w], 1e-3)))
        g_s = jnp.exp(-s2 / jnp.square(jnp.maximum(
            win[nch + 5][th : 2 * th, padx : padx + w], 1e-3)))
        acc_d = c_img[0:3]
        acc_s = c_img[3:6]
        wsum_d = jnp.ones((th, w), F32)
        wsum_s = jnp.ones((th, w), F32)
    else:
        acc = c_img
        wsum = jnp.ones((th, w), F32)
    kernel_w = {0: 1.0, 1: 2.0 / 3.0, 2: 1.0 / 6.0}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            oy, ox = th + dy * stride, padx + dx * stride
            q = src[:, oy - off : oy - off + th, ox : ox + w]
            qz = vz[oy : oy + th, ox : ox + w]
            qn = nrm[:, oy : oy + th, ox : ox + w]
            w_depth = jnp.exp(
                -jnp.abs(qz - c_vz) / (0.05 * jnp.maximum(c_vz, C.VIEWZ_MIN))
            )
            ndot = jnp.maximum((qn * c_n).sum(axis=0), 0.0)
            w_norm = ndot ** 8
            wq = w_depth * w_norm * kernel_w[max(abs(dy), abs(dx))]
            if has_guide:
                wq_d = wq * g_d
                wq_s = wq * g_s
                acc_d = acc_d + q[0:3] * wq_d[None]
                acc_s = acc_s + q[3:6] * wq_s[None]
                wsum_d = wsum_d + wq_d
                wsum_s = wsum_s + wq_s
            else:
                acc = acc + q * wq[None]
                wsum = wsum + wq
    if has_guide:
        out_ref[:] = jnp.concatenate(
            [acc_d / wsum_d[None], acc_s / wsum_s[None]], axis=0)
    else:
        out_ref[:] = acc / wsum[None]


def _shadow_kernel(th, padx, w, radius, softness, depth_threshold, win, out_ref):
    """ShadowDenoise.hlsl:39-131 on a 3-band row window.

    win channels: 0:2 shadow (penumbra, visibility), 2 obj_id (as f32 —
    exact compares stay exact since ids are small ints), 3 view_z,
    4:7 normal.
    """
    sh = win[0:2]
    oid = win[2]
    vz = win[3]
    nrm = win[4:7]

    c_sh = sh[:, th : 2 * th, padx : padx + w]
    c_oid = oid[th : 2 * th, padx : padx + w]
    c_vz = vz[th : 2 * th, padx : padx + w]
    c_n = nrm[:, th : 2 * th, padx : padx + w]

    wsum = jnp.zeros((th, w), F32)
    pen_sum = jnp.zeros((th, w), F32)
    vis_sum = jnp.zeros((th, w), F32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            oy, ox = th + dy, padx + dx
            q = sh[:, oy : oy + th, ox : ox + w]
            q_oid = oid[oy : oy + th, ox : ox + w]
            q_vz = vz[oy : oy + th, ox : ox + w]
            q_n = nrm[:, oy : oy + th, ox : ox + w]
            same = q_oid == c_oid  # exact match (ShadowDenoise.hlsl:93)
            w_depth = jnp.exp(
                -jnp.abs(c_vz - q_vz) / jnp.maximum(depth_threshold * c_vz, 0.001)
            )
            w_norm = jnp.maximum((q_n * c_n).sum(axis=0), 0.0) ** 8
            d2 = float(dx * dx + dy * dy)
            w_spatial = jnp.exp(-d2 / (2.0 * softness * softness + 0.01))
            wq = jnp.where(same, w_depth * w_norm * w_spatial, 0.0)
            pen_sum = pen_sum + q[0] * wq
            vis_sum = vis_sum + q[1] * wq
            wsum = wsum + wq

    ok = wsum > 0.001
    pen = jnp.where(ok, pen_sum / jnp.maximum(wsum, 1e-6), c_sh[0])
    vis = jnp.where(ok, vis_sum / jnp.maximum(wsum, 1e-6), c_sh[1])
    # Sky pixels pass through (ShadowDenoise.hlsl:56-60)
    sky = c_oid < 0.0
    out_ref[:] = jnp.stack(
        [jnp.where(sky, c_sh[0], pen), jnp.where(sky, c_sh[1], vis)], axis=0
    )


_STENCIL_PADX = 128  # lane-aligned horizontal halo (covers strides <= 128)

# Fuse all a-trous passes into one kernel (one DMA set instead of one per
# pass). RTVS_ATROUS_FUSED=0 selects the per-pass kernels for A/B probing.
_ATROUS_FUSED = os.environ.get("RTVS_ATROUS_FUSED", "1") == "1"


def _windowed_call(kernel, nch_in, nch_out, packed, interpret,
                   vmem_limit_bytes=None, bpe=440):
    """Run `kernel` over full-width row bands with a 3-band window.

    The input is edge-replicated (one band vertically, 128 px horizontally)
    so border pixels see pixel-clamped neighbors — exactly the jnp oracle's
    (and a GPU texture load's) border semantics. Full-width bands keep the
    per-program DMA count at 4, which is what the stencil's runtime is made
    of on TPU.
    """
    _, height, width = packed.shape
    budget = (int(0.95 * vmem_limit_bytes) if vmem_limit_bytes
              else 15_500_000)
    th, _ = _stencil_sizes(height, width, 1, budget=budget, bpe=bpe)
    nty = height // th
    padx = _STENCIL_PADX
    padded = jnp.pad(packed, ((0, 0), (th, th), (padx, padx)), mode="edge")
    wp = width + 2 * padx

    in_specs = [
        pl.BlockSpec((nch_in, th, wp), lambda i, _d=d: (0, i + _d, 0))
        for d in (0, 1, 2)
    ]

    def body(b0, b1, b2, out):
        # window may be stored/streamed at half precision; compute runs f32
        win = jnp.concatenate([b0[:], b1[:], b2[:]], axis=1)  # [C, 3*th, wp]
        kernel(th, padx, width, win.astype(F32), out)

    params = (pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes)
              if vmem_limit_bytes else None)
    return pl.pallas_call(
        body,
        grid=(nty,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nch_out, th, width), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((nch_out, height, width), F32),
        interpret=interpret,
        compiler_params=params,
    )(padded, padded, padded)


def stencil_supported(height: int, width: int) -> bool:
    return _stencil_sizes(height, width, 1) is not None


@functools.partial(jax.jit,
                   static_argnames=("passes", "interpret", "storage_dtype",
                                    "anti_firefly"))
def atrous(img, view_z, normal, passes: int = 3, interpret: bool = False,
           storage_dtype=None, guide=None, anti_firefly: bool = False):
    """Edge-stopping a-trous over channel-first img [C,H,W].

    view_z [H,W], normal [3,H,W]. Edge handling clamps at the frame border
    (the jnp oracle in post/denoise.py matches). Strides 1,2,4 per pass;
    stride s uses a halo of s, carried through the same 3x3 block window
    (s <= th,tw).

    storage_dtype (e.g. jnp.bfloat16) streams the packed window through
    VMEM at that precision — the stencil is DMA-bound, so this halves its
    traffic; taps/weights still compute in f32 (input-quantization error
    only). None keeps the f32 window (bit-exact vs the oracle).

    REBLUR fidelity (post/denoise.py semantics, NRDDenoiser.cpp:858-862):
    `guide` [2,H,W] per-pixel blur radii splits the 6-channel img into
    diffuse/specular weight groups with per-pass radius attenuation;
    `anti_firefly` luminance-clamps the chain input.
    """
    nch = img.shape[0]
    has_guide = guide is not None

    # The fused kernel's shrinking-extent math needs the first pass's
    # extent start th - sum(strides[1:]) to clear its own stride (plus one
    # more row for the anti-firefly clamp): th - need[0] - strides[0]
    # - (1 if firefly) >= 0. With th >= 8 (_windowed_call's minimum band)
    # that holds for passes <= 3 (8 - 6 - 1 - 1 = 0) and wraps slices
    # (silent corruption) at passes >= 4 — route larger pass counts
    # through the exact per-pass kernels instead.
    strides = [1 << p for p in range(passes)]
    fused_ok = 8 - sum(strides[1:]) - strides[0] - (1 if anti_firefly else 0) >= 0

    if _ATROUS_FUSED and fused_ok:
        chans = [img, view_z[None], normal]
        if has_guide:
            chans.append(guide)
        packed = jnp.concatenate(chans, axis=0)
        if storage_dtype is not None:
            packed = packed.astype(storage_dtype)
        nch_in = packed.shape[0]

        def kernel(th, padx, w, win, o):
            return _atrous_fused_kernel(th, padx, w, passes, nch, win, o,
                                        has_guide=has_guide,
                                        firefly=anti_firefly)

        # The fused kernel's Mosaic stack (3 in-register passes over the
        # [C, 3*th, wp] window) exceeds the default 16 MB scoped-VMEM limit
        # at 4K (measured 33.7 MB needed at th=8/wp=4096); raise the
        # per-kernel cap — v5e has 128 MB physical VMEM — and size bands
        # against it (bpe=1030 measured at the 10-channel window, scaled
        # by channel count), keeping 16-row bands at 1440p/4K: half the
        # programs/DMAs of 8-row bands.
        return _windowed_call(kernel, nch_in, nch, packed, interpret,
                              vmem_limit_bytes=100 << 20,
                              bpe=-(-1030 * nch_in // 10))

    # Unfused fallback (RTVS_ATROUS_FUSED=0, or passes >= 4 where the
    # fused extents would underflow): one windowed call per pass —
    # 3x the stencil DMA/launches, but a ~3x smaller in-kernel working set.
    out = img
    for p in range(passes):
        out = atrous_single_pass(out, view_z, normal, 1 << p, interpret,
                                 storage_dtype=storage_dtype, guide=guide,
                                 anti_firefly=anti_firefly and p == 0)
    return out


def atrous_single_pass(img, view_z, normal, stride: int, interpret: bool = False,
                       storage_dtype=None, guide=None,
                       anti_firefly: bool = False):
    """One edge-stopping a-trous pass at the given stride (the sharded
    pipeline runs passes separately, exchanging a row halo between them —
    the fused 3-pass kernel cannot host a collective mid-kernel).
    `guide`/`anti_firefly` as in atrous (firefly is the stride-1 head
    clamp)."""
    nch = img.shape[0]
    has_guide = guide is not None
    chans = [img, view_z[None], normal]
    if has_guide:
        chans.append(guide)
    packed = jnp.concatenate(chans, axis=0)
    if storage_dtype is not None:
        packed = packed.astype(storage_dtype)
    nch_in = packed.shape[0]

    def kernel(th, padx, w, win, o):
        return _atrous_pass_kernel(th, padx, w, stride, nch, win, o,
                                   has_guide=has_guide,
                                   firefly=anti_firefly)

    return _windowed_call(kernel, nch_in, nch, packed, interpret,
                          bpe=-(-440 * nch_in // 10))


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def shadow_denoise(shadow, obj_id, view_z, normal, radius: int = 2,
                   softness: float = 1.0, depth_threshold: float = 0.1,
                   interpret: bool = False):
    """Custom shadow filter; shadow [2,H,W], obj_id [H,W] i32."""
    packed = jnp.concatenate(
        [shadow, obj_id.astype(F32)[None], view_z[None], normal], axis=0
    )

    def kernel(th, padx, w, win, o):
        return _shadow_kernel(th, padx, w, radius, softness, depth_threshold, win, o)

    # Same raised-cap trade as the fused a-trous: keep 16-row bands at
    # 1440p/4K (bpe measured-safe upper bound for the 5x5 single pass).
    return _windowed_call(kernel, 7, 2, packed, interpret,
                          vmem_limit_bytes=100 << 20, bpe=700)
