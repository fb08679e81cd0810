"""Channel-first pipeline (ops/render_cf.py) vs the classic lane pipeline.

The CF path re-states the G-buffer assembly + denoise + composite on
[c,H,W] planes (the megakernel's native output layout) to eliminate the
measured ~23 ms of lane-interleave churn at 4K. Same math, op for op:
the RGBA image must be bit-identical, aux surfaces within float noise.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.ops.render import render_rows
from raytracevs_tpu.ops.render_cf import lane_gbuffer_from_cf, render_rows_cf
from raytracevs_tpu.post import composite as composite_mod
from raytracevs_tpu.post import denoise as denoise_mod
from raytracevs_tpu.post import tonemap
from raytracevs_tpu.runtime.engine import Engine

W, H = 256, 32  # smallest reproject/stencil-supported size (w%128 and
                # w>=2*128 for the reproject block window; h%8, h>=2*th,
                # one 32-row megakernel tile) — the module fixture runs TWO
                # interpret-mode megakernel renders, so rows are the suite's
                # runtime


@pytest.fixture(scope="module", params=[
    pytest.param(2, id="b2"),
    pytest.param(4, id="b4", marks=pytest.mark.nightly),
])
def frames(request):
    # Fast tier renders at max_bounces=2 (interpret-mode megakernel time
    # scales with the bounce loop; every code path — spawns, shadows,
    # thickness — already fires at depth 1-2). Nightly keeps the original
    # 4-bounce frames.
    from conftest import analytic_scene_file

    eng = Engine(W, H)
    eng.load_rtvs(analytic_scene_file(), samples_per_pixel=1,
                  max_bounces=request.param, enable_denoiser=True)
    flat, cfg = eng._flat, eng._cfg
    out_l = render_rows(flat, cfg, jnp.int32(0), H, backend="pallas",
                        interpret=True)
    out_c = render_rows_cf(flat, cfg, jnp.int32(0), H, backend="pallas",
                           interpret=True)
    return flat, cfg, out_l, out_c


def test_cf_gbuffer_matches_lane(frames):
    _, _, out_l, out_c = frames
    g_l = out_l.gbuffer
    g_c = lane_gbuffer_from_cf(out_c.gbuffer)
    for name in g_l._fields:
        a = np.asarray(getattr(g_l, name), np.float64)
        b = np.asarray(getattr(g_c, name), np.float64)
        # oct-encode/normalize use different (equivalent) reduction
        # primitives -> ULP-level noise on normals only
        tol = 1e-6 if name == "normal_roughness" else 0.0
        assert np.abs(a - b).max() <= tol, name
    np.testing.assert_array_equal(
        np.asarray(out_l.color),
        np.asarray(out_c.color.transpose(1, 2, 0).reshape(-1, 3)))
    assert float(out_l.rays) == float(out_c.rays)


def test_cf_full_frame_bit_identical(frames):
    """Denoise + composite + RGBA8: the user-visible image must match the
    lane pallas chain exactly."""
    flat, cfg, out_l, out_c = frames
    st = denoise_mod.init_state_cf(H, W)

    dd, ds, dsh, st_l = denoise_mod.denoise_frame(
        out_l.gbuffer, H, W, st, backend="pallas", interpret=True)
    c_l = composite_mod.composite(
        out_l.gbuffer, out_l.raw_specular, flat.exposure,
        flat.tone_map_operator, flat.gamma, denoised_diffuse=dd,
        denoised_specular=ds, use_denoised=True,
        nrd_bypass_distance=flat.nrd_bypass_distance,
        nrd_bypass_blend=flat.nrd_bypass_blend)
    rgba_l = np.asarray(tonemap.to_rgba8(c_l)).reshape(H, W, 4)

    dd2, ds2, dsh2, st_c = denoise_mod.denoise_frame_cf(
        out_c.gbuffer, st, interpret=True)
    c_c = composite_mod.composite_cf(
        out_c.gbuffer, out_c.raw_specular, flat.exposure,
        flat.tone_map_operator, flat.gamma, denoised_diffuse=dd2,
        denoised_specular=ds2, use_denoised=True,
        nrd_bypass_distance=flat.nrd_bypass_distance,
        nrd_bypass_blend=flat.nrd_bypass_blend)
    rgba_c = np.asarray(tonemap.to_rgba8_cf(c_c))

    np.testing.assert_array_equal(rgba_l, rgba_c)
    np.testing.assert_array_equal(np.asarray(st_l.packed),
                                  np.asarray(st_c.packed))
    # shadow aux: penumbra rides at NRD_FP16_MAX magnitude; the ULP-level
    # normal difference shifts edge-stopping weights by ~1e-7 relative
    np.testing.assert_allclose(
        np.asarray(dsh2.transpose(1, 2, 0).reshape(-1, 2)),
        np.asarray(dsh), rtol=1e-5, atol=1e-5)


def test_cf_composite_no_denoiser(frames):
    flat, _, out_l, out_c = frames
    c_l = composite_mod.composite(
        out_l.gbuffer, out_l.raw_specular, flat.exposure,
        flat.tone_map_operator, flat.gamma, use_denoised=False)
    rgba_l = np.asarray(tonemap.to_rgba8(c_l)).reshape(H, W, 4)
    c_c = composite_mod.composite_cf(
        out_c.gbuffer, out_c.raw_specular, flat.exposure,
        flat.tone_map_operator, flat.gamma, use_denoised=False)
    rgba_c = np.asarray(tonemap.to_rgba8_cf(c_c))
    np.testing.assert_array_equal(rgba_l, rgba_c)
