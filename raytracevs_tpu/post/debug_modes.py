"""Composite debug visualization modes (src/Shader/Composite.hlsl:184-371,
487-506).

The reference treats these as its primary integration-test surface
(SURVEY §4): full-screen shadow inputs/outputs, split-screen compares, a
G-buffer tile strip, photon heatmaps and a photon-capacity overlay bar.
Mode numbers match the reference's CompositeConstants.DebugMode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from . import tonemap

F32 = jnp.float32


def _heatmap(t):
    """Heatmap (Composite.hlsl:108-123)."""
    t = jnp.clip(t, 0.0, 1.0)
    c1 = jnp.array([0.0, 0.0, 0.2], F32)
    c2 = jnp.array([0.0, 0.4, 1.0], F32)
    c3 = jnp.array([0.0, 1.0, 0.2], F32)
    c4 = jnp.array([1.0, 1.0, 0.0], F32)
    c5 = jnp.array([1.0, 0.2, 0.0], F32)

    def seg(a, b, lo):
        f = ((t - lo) / 0.25)[..., None]
        return a + (b - a) * f

    out = jnp.where((t < 0.25)[..., None], seg(c1, c2, 0.0),
                    jnp.where((t < 0.5)[..., None], seg(c2, c3, 0.25),
                              jnp.where((t < 0.75)[..., None], seg(c3, c4, 0.5),
                                        seg(c4, c5, 0.75))))
    return out


def _visualize_depth(view_z):
    """VisualizeDepth (Composite.hlsl:130-147): near=blue, mid=green, far=red."""
    nd = jnp.clip(view_z / 100.0, 0.0, 1.0)
    lo = jnp.stack([jnp.zeros_like(nd), nd * 2.0, 1.0 - nd * 2.0], axis=-1)
    t = (nd - 0.5) * 2.0
    hi = jnp.stack([t, 1.0 - t, jnp.zeros_like(nd)], axis=-1)
    return jnp.where((nd < 0.5)[..., None], lo, hi)


def _visualize_motion(mv):
    """VisualizeMotionVectors (Composite.hlsl:150-155)."""
    scaled = mv * 10.0
    return jnp.stack(
        [jnp.abs(scaled[..., 0]), jnp.abs(scaled[..., 1]),
         jnp.full(mv.shape[:-1], 0.5, F32)], axis=-1
    )


def _visualize_normal(nr):
    """VisualizeNormal (Composite.hlsl:158-164)."""
    n = nr[..., :3] * 2.0 - 1.0
    return n * 0.5 + 0.5


def composite_debug(mode: int, gbuffer, height: int, width: int,
                    denoised_diffuse=None, denoised_specular=None,
                    denoised_shadow=None, exposure=1.0,
                    photon_map_size: int = 0, max_photons: int = C.MAX_PHOTONS,
                    debug_tile_scale: float = 0.15):
    """Render a debug visualization; returns [H,W,3] display-ready color.

    mode follows Composite.hlsl's DebugMode switch (modes 1-10).
    """
    def img(a, c=None):
        return a.reshape(height, width, c) if c else a.reshape(height, width)

    diffuse_in = img(gbuffer.diffuse_hitdist, 4)[..., :3]
    specular_in = img(gbuffer.specular_hitdist, 4)[..., :3]
    nr = img(gbuffer.normal_roughness, 4)
    view_z = img(gbuffer.view_z)
    motion = img(gbuffer.motion, 2)
    albedo = img(gbuffer.albedo, 4)[..., :3]
    shadow = img(gbuffer.shadow_data, 2)
    dd = denoised_diffuse.reshape(height, width, 3) if denoised_diffuse is not None \
        else diffuse_in
    ds = denoised_specular.reshape(height, width, 3) if denoised_specular is not None \
        else specular_in
    dsh = denoised_shadow.reshape(height, width, 2) if denoised_shadow is not None \
        else shadow

    srgb = tonemap.linear_to_srgb
    aces = tonemap.aces_film

    if mode == 2:  # input shadow visibility (Composite.hlsl:193-198)
        v = shadow[..., 1]
        out = srgb(jnp.stack([v, v, v], axis=-1))
    elif mode == 3:  # denoised shadow (Composite.hlsl:200-205)
        v = dsh[..., 1]
        out = srgb(jnp.stack([v, v, v], axis=-1))
    elif mode == 4:  # split input | denoised shadow (Composite.hlsl:207-221)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        v = jnp.where(xs < width // 2, shadow[..., 1], dsh[..., 1])
        out = srgb(jnp.stack([v, v, v], axis=-1))
    elif mode == 5:  # solid magenta sanity fill (Composite.hlsl:223-227)
        out = jnp.broadcast_to(jnp.array([1.0, 0.0, 1.0], F32), (height, width, 3))
    elif mode == 6:  # denoised diffuse only (Composite.hlsl:229-235)
        out = srgb(aces(dd * exposure))
    elif mode == 7:  # diffuse * albedo (Composite.hlsl:237-244)
        out = srgb(aces(dd * albedo * exposure))
    elif mode == 8:  # raw diffuse input (Composite.hlsl:246-252)
        out = srgb(aces(diffuse_in * exposure))
    elif mode == 9:  # photon contribution linear (Composite.hlsl:254-260)
        out = srgb(aces(diffuse_in * exposure))
    elif mode == 10:  # photon heatmap (Composite.hlsl:262-269)
        lum = (diffuse_in[..., 0] * 0.2126 + diffuse_in[..., 1] * 0.7152
               + diffuse_in[..., 2] * 0.0722)
        mapped = jnp.log2(1.0 + lum * 4.0) / 4.0
        out = srgb(_heatmap(mapped))
    elif mode == 1:  # G-buffer tile strip along the bottom (Composite.hlsl:282-371)
        out = srgb(jnp.clip(dd, 0.0, 1.0))
        tile_h = max(int(height * debug_tile_scale), 8)
        area_y = height - tile_h - 10
        ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        in_strip = ys > area_y
        tile_idx = xs // tile_h
        local_x = ((xs % tile_h).astype(F32)) / tile_h
        local_y = (ys - area_y).astype(F32) / tile_h
        # nearest-neighbor sample of each buffer at tile-local uv
        sy = jnp.clip((local_y * height).astype(jnp.int32), 0, height - 1)
        sx = jnp.clip((local_x * width).astype(jnp.int32), 0, width - 1)

        tiles = [
            jnp.clip(diffuse_in[sy, sx], 0.0, 1.0),       # 0 input diffuse
            jnp.clip(specular_in[sy, sx], 0.0, 1.0),      # 1 input specular
            jnp.clip(dd[sy, sx], 0.0, 1.0),               # 2 denoised diffuse
            jnp.clip(ds[sy, sx], 0.0, 1.0),               # 3 denoised specular
            _visualize_normal(nr[sy, sx]),                # 4 normal+roughness
            _visualize_depth(view_z[sy, sx]),             # 5 viewZ
            _visualize_motion(motion[sy, sx]),            # 6 motion vectors
            jnp.repeat(shadow[sy, sx][..., 1:2], 3, -1),  # 7 input shadow
            jnp.repeat(dsh[sy, sx][..., 1:2], 3, -1),     # 8 denoised shadow
        ]
        tile_color = jnp.zeros((height, width, 3), F32)
        for i, t in enumerate(tiles):
            tile_color = jnp.where((tile_idx == i)[..., None], t, tile_color)
        border = (local_x < 0.01) | (local_x > 0.99) | (local_y < 0.01) | (local_y > 0.99)
        tile_color = jnp.where(border[..., None], 1.0, tile_color)
        out = jnp.where(in_strip[..., None], srgb(tile_color), out)
    else:
        out = srgb(jnp.clip(dd, 0.0, 1.0))

    # Photon capacity overlay bar (Composite.hlsl:487-506)
    if mode > 0 and max_photons > 0 and photon_map_size > 0:
        bar_w = max(64, width // 5)
        bar_h = 8
        ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        in_bar = (xs < bar_w) & (ys < bar_h)
        ratio = min(photon_map_size / max_photons, 1.0)
        filled = int(round(ratio * bar_w))
        fill_color = jnp.array([0.1, 0.9, 0.1], F32) + (
            jnp.array([0.9, 0.1, 0.1], F32) - jnp.array([0.1, 0.9, 0.1], F32)
        ) * ratio
        bar = jnp.where((xs < filled)[..., None], fill_color,
                        jnp.array([0.05, 0.05, 0.05], F32))
        out = jnp.where(in_bar[..., None], bar, out)
    return out
