"""Rotation-reprojection quality (VERDICT r2 weak #3 / action #8).

The Pallas denoiser reprojects with each tile's MEAN motion vector and
drops history where per-pixel motion deviates by more than RESIDUAL_LIMIT
px (ops/pallas/denoise_kernels.py) — camera pans are exact, but rotation /
parallax produce motion gradients across a tile. This test renders an
ORBITING-camera sequence around the sample scene and compares the
Pallas-denoised output against the jnp oracle (which reprojects per-pixel
like NRD, NRDDenoiser.cpp:774-1280) frame by frame. The SSIM bound is the
quantified quality delta the verdict asked for.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.post import denoise as dn
from raytracevs_tpu.utils.ssim import ssim

H, W = 256, 512  # reproject_supported shape (th=8, tw=128)
ORBIT_DEG_PER_FRAME = 2.0  # a brisk orbit: ~120 deg/s at 60 fps
FRAMES = 5
SSIM_MIN = 0.97


def _orbit_engine(angle_deg):
    from raytracevs_tpu.runtime.engine import Engine

    engine = Engine(W, H, device_mesh=None)
    graph = engine.load_rtvs_graph("/root/reference/sample_scene.rtvs")
    from raytracevs_tpu.scene.evaluator import evaluate_scene

    scene = evaluate_scene(graph)
    # orbit the camera around the look-at point (y axis)
    a = np.deg2rad(angle_deg)
    look = np.asarray(scene.camera.look_at, np.float64)
    rel = np.asarray(scene.camera.position, np.float64) - look
    rot = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]])
    scene.camera.position = look + rot @ rel
    return engine, scene


@pytest.mark.nightly
def test_orbiting_camera_pallas_vs_oracle():
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    assert dk.reproject_supported(H, W)

    engine, scene0 = _orbit_engine(0.0)
    state_jnp = dn.init_state(H, W)
    state_pal = dn.init_state(H, W)
    prev_vp = None
    scores = []
    for frame in range(FRAMES):
        engine_f, scene = _orbit_engine(frame * ORBIT_DEG_PER_FRAME)
        from raytracevs_tpu.scene.flatten import flatten_scene, make_config
        from raytracevs_tpu.scene.sanitize import sanitize_scene

        clean = sanitize_scene(scene)
        flat = flatten_scene(clean, frame_index=frame, aspect=W / H,
                             prev_view_proj=prev_vp)
        cfg = make_config(clean, W, H, samples_per_pixel=1, max_bounces=3,
                          enable_denoiser=True)
        prev_vp = np.asarray(flat.view_proj)
        out = render_rows(flat, cfg, jnp.int32(0), H, backend="jnp")

        dd_j, ds_j, _sh_j, state_jnp = dn.denoise_frame(
            out.gbuffer, H, W, state_jnp, backend="jnp")
        dd_p, ds_p, _sh_p, state_pal = dn._denoise_frame_pallas(
            out.gbuffer, H, W, state_pal, interpret=True)

        img_j = np.asarray(dd_j).reshape(H, W, 3)
        img_p = np.asarray(dd_p).reshape(H, W, 3)
        scale = max(float(img_j.max()), 1e-6)
        score = ssim(np.clip(img_p / scale, 0, 1) * 255.0,
                     np.clip(img_j / scale, 0, 1) * 255.0)
        scores.append(score)

    # frame 0 has no history (both paths restart): should be ~identical;
    # later frames quantify the rotating-motion quality delta
    assert scores[0] >= 0.995, scores
    assert min(scores[1:]) >= SSIM_MIN, (
        f"rotating-camera Pallas reprojection degraded vs oracle: {scores}")
