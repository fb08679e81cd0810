"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax

from raytracevs_tpu.ops.render import render_frame
from raytracevs_tpu.parallel.tiles import make_mesh, render_frame_sharded
from raytracevs_tpu.scene.data import (
    LightData, LightType, PlaneData, SceneData, SphereData,
)
from raytracevs_tpu.scene.flatten import flatten_scene, make_config
from raytracevs_tpu.scene.sanitize import sanitize_scene


def _scene():
    scene = SceneData()
    scene.objects.append(SphereData(position=np.array([0.0, 1.0, 0.0]), radius=1.0))
    scene.objects.append(PlaneData())
    scene.lights.append(
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]), intensity=5.0)
    )
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    return sanitize_scene(scene)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device():
    scene = _scene()
    flat = flatten_scene(scene)
    cfg = make_config(scene, 32, 32)
    single = render_frame(flat, cfg)
    mesh = make_mesh()
    sharded = render_frame_sharded(flat, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.color), np.asarray(single.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.gbuffer.view_z), np.asarray(single.gbuffer.view_z), atol=1e-4
    )
    assert float(np.asarray(sharded.rays).sum()) == float(np.asarray(single.rays))


def test_sharded_output_is_actually_sharded():
    scene = _scene()
    flat = flatten_scene(scene)
    cfg = make_config(scene, 32, 32)
    mesh = make_mesh()
    out = render_frame_sharded(flat, cfg, mesh)
    shards = out.color.addressable_shards
    assert len(shards) == 8
    # each device holds a distinct row slab
    assert shards[0].data.shape[0] == 32 * 32 // 8


def test_height_divisibility_guard():
    scene = _scene()
    flat = flatten_scene(scene)
    cfg = make_config(scene, 32, 30)
    with pytest.raises(ValueError):
        render_frame_sharded(flat, cfg, make_mesh())
