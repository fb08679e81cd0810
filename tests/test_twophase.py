"""Two-phase (ray-regrouping) megakernel equivalence vs the monolithic one.

Phase A runs one machine iteration per pixel in screen tiles; phase B
resumes the spawned continuations in coherence-sorted tiles
(ops/pallas/megakernel.py::render_accum_pallas_twophase). Per-lane state
transitions are lane-local, so regrouping must not change any pixel's ray
tree — ray counts match EXACTLY; color differs only by float association
(A.color + B.color vs the interleaved monolithic accumulation).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.nightly

import jax
import jax.numpy as jnp

from raytracevs_tpu.scene.evaluator import evaluate_scene
from raytracevs_tpu.scene.flatten import flatten_scene, make_config
from raytracevs_tpu.scene.rtvs import load_graph
from raytracevs_tpu.scene.sanitize import sanitize_scene
from raytracevs_tpu.ops.render import render_rows


def _mesh_glass_scene():
    from conftest import wine_glass_scene

    scene, ms = wine_glass_scene()
    flat = flatten_scene(scene, aspect=1.0, mesh_service=ms)
    cfg = make_config(scene, 64, 64)
    return flat, cfg


def _compare(flat, cfg, num_rows):
    mono = render_rows(flat, cfg, jnp.int32(0), num_rows, backend="pallas",
                       interpret=True)
    two = render_rows(flat, cfg, jnp.int32(0), num_rows, backend="pallas2",
                      interpret=True)
    # Phase B re-derives the post-primary state in a separately compiled
    # kernel, so XLA's fusion/FMA choices differ by ~1 ULP — enough to flip
    # discrete path decisions on grazing glass rays (the same chaos budget
    # as the pallas-vs-jnp mesh test). Everything else must agree tightly.
    r_mono = float(np.asarray(mono.rays))
    r_two = float(np.asarray(two.rays))
    assert abs(r_two - r_mono) / r_mono < 2e-3
    cd = np.abs(np.asarray(two.color) - np.asarray(mono.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02, f"{(cd > 1e-3).mean():.4f} of pixels diverge"
    assert np.median(cd) < 1e-5
    # The G-buffer comes entirely from phase A (records are depth-0 only)
    np.testing.assert_array_equal(
        np.asarray(two.gbuffer.obj_id), np.asarray(mono.gbuffer.obj_id)
    )
    np.testing.assert_allclose(
        np.asarray(two.gbuffer.normal_roughness),
        np.asarray(mono.gbuffer.normal_roughness), atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(two.gbuffer.shadow_data),
        np.asarray(mono.gbuffer.shadow_data), atol=2e-3,
    )


def test_twophase_matches_monolithic_mesh_glass():
    """Wine-glass scene: the two-phase target workload (BVH + glass trees)."""
    flat, cfg = _mesh_glass_scene()
    _compare(flat, cfg, 64)


def test_twophase_matches_monolithic_analytic(sample_scene_path):
    """Analytic sample scene at spp=1: glass+metal spheres, soft shadows."""
    scene = sanitize_scene(evaluate_scene(load_graph(sample_scene_path)))
    flat = flatten_scene(scene)
    cfg = make_config(scene, 128, 32, samples_per_pixel=1, max_bounces=4)
    _compare(flat, cfg, 32)
