"""Pallas megakernel equivalence vs the jnp wavefront (interpreter mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracevs_tpu.scene.evaluator import evaluate_scene
from raytracevs_tpu.scene.flatten import flatten_scene, make_config
from raytracevs_tpu.scene.rtvs import load_graph
from raytracevs_tpu.scene.sanitize import sanitize_scene
from raytracevs_tpu.ops.render import render_rows


@pytest.fixture(scope="module")
def sample_flat(sample_scene_path):
    scene = sanitize_scene(evaluate_scene(load_graph(sample_scene_path)))
    return scene, flatten_scene(scene)


def test_megakernel_matches_jnp_wavefront(sample_flat):
    """Full sample-scene semantics: glass, metal, soft shadows, sky, checker."""
    scene, flat = sample_flat
    cfg = make_config(scene, 128, 32, samples_per_pixel=1, max_bounces=4)
    ref = jax.jit(lambda s: render_rows(s, cfg, jnp.int32(0), 32))(flat)
    pal = jax.jit(
        lambda s: render_rows(s, cfg, jnp.int32(0), 32, backend="pallas", interpret=True)
    )(flat)
    # identical ray counts = identical control flow through the DFS
    assert float(np.asarray(pal.rays)) == float(np.asarray(ref.rays))
    np.testing.assert_allclose(
        np.asarray(pal.color), np.asarray(ref.color), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pal.gbuffer.view_z), np.asarray(ref.gbuffer.view_z), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id)
    )
    np.testing.assert_allclose(
        np.asarray(pal.gbuffer.shadow_data), np.asarray(ref.gbuffer.shadow_data),
        atol=2e-3,
    )
