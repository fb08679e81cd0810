"""Dense-packed megakernel tables at scale: a ~12k-triangle procedural mesh.

The naive [T,12] triangle layout padded every VMEM row to 128 lanes, so a
mesh this size (12k tris ~ 12 MB padded) could never have fit the ~16 MB
VMEM budget; the dense layout (pack_mesh: 8 tris/row, fused node rows)
carries it in ~2.2 MB. This test proves the packed traversal stays
equivalent to the jnp oracle well beyond the wine-glass size, and that the
backend pick now admits such meshes.
"""
import tempfile

import pytest

import numpy as np

import jax.numpy as jnp

from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
from raytracevs_tpu.ops.render import render_rows
from raytracevs_tpu.scene.data import (
    LightData, LightType, MaterialData, MeshObjectData, PlaneData, SceneData,
)
from raytracevs_tpu.scene.flatten import flatten_scene, make_config


def _uv_sphere(rings=78, segs=78, radius=0.9):
    """Smooth UV sphere: 2*rings*segs triangles with analytic normals."""
    vs = []
    for r in range(rings + 1):
        th = np.pi * r / rings
        for s in range(segs + 1):
            ph = 2.0 * np.pi * s / segs
            n = np.array([np.sin(th) * np.cos(ph), np.cos(th),
                          np.sin(th) * np.sin(ph)])
            vs.append((radius * n, n))
    verts = np.zeros((len(vs), 8), np.float32)
    for i, (p, n) in enumerate(vs):
        verts[i, 0:3] = p
        verts[i, 4:7] = n
    idx = []
    for r in range(rings):
        for s in range(segs):
            a = r * (segs + 1) + s
            b = a + segs + 1
            idx += [a, b, a + 1, a + 1, b, b + 1]
    indices = np.asarray(idx, np.uint32)
    return verts.reshape(-1), indices


def _big_scene():
    """Flat scene + config for the ~12k-tri sphere (shared by both tests)."""
    verts, indices = _uv_sphere()
    num_tris = len(indices) // 3
    assert num_tris > 12000  # well beyond the wine glass's 5.9k

    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("BigSphere", CachedMesh(
        name="BigSphere", vertices=verts, indices=indices,
        bounds_min=np.array([-0.9, -0.9, -0.9]),
        bounds_max=np.array([0.9, 0.9, 0.9]),
    ))

    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.8, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    mat = MaterialData(base_color=np.array([0.8, 0.5, 0.3, 1.0]), roughness=0.5)
    scene.objects += [
        MeshObjectData(mesh_name="BigSphere", material=mat),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]),
                  intensity=10.0),
    ]
    flat = flatten_scene(scene, aspect=64 / 32, mesh_service=ms)
    cfg = make_config(scene, 64, 32)
    assert flat.mesh is not None
    assert int(flat.mesh.mk_num_tris) >= num_tris  # leaf-padded
    return flat, cfg


@pytest.mark.nightly
def test_big_mesh_megakernel_matches_jnp():
    flat, cfg = _big_scene()

    # The dense layout keeps this mesh inside the megakernel VMEM budget
    from raytracevs_tpu.ops.pallas.megakernel import mesh_table_bytes

    assert mesh_table_bytes(int(flat.mesh.mk_num_nodes),
                            int(flat.mesh.mk_num_tris)) < 6 * 1024 * 1024

    ref = render_rows(flat, cfg, jnp.int32(0), 32)
    pal = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                      interpret=True)
    assert float(np.asarray(pal.rays)) == float(np.asarray(ref.rays))
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id)
    )


@pytest.mark.nightly
def test_packed_node_table_matches_flat(monkeypatch):
    """Dense-packed node rows (8 nodes/128-lane row, used past
    _NODE_PACK_MB) must traverse identically to the flat [Nn,16] layout.
    Forced on a small mesh by dropping the pack threshold to zero; a
    distinct render height keeps the jit cache from reusing the
    flat-layout trace."""
    import jax

    from raytracevs_tpu.ops.pallas import megakernel as mk

    verts, indices = _uv_sphere(rings=16, segs=16)
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("BigSphere", CachedMesh(
        name="BigSphere", vertices=verts, indices=indices,
        bounds_min=np.array([-0.9, -0.9, -0.9]),
        bounds_max=np.array([0.9, 0.9, 0.9]),
    ))
    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.8, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    scene.objects += [
        MeshObjectData(mesh_name="BigSphere",
                       material=MaterialData(
                           base_color=np.array([0.8, 0.5, 0.3, 1.0]),
                           roughness=0.5)),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]),
                  intensity=10.0),
    ]
    flat = flatten_scene(scene, aspect=64 / 16, mesh_service=ms)
    cfg = make_config(scene, 64, 16)
    assert not mk.node_table_packed(int(flat.mesh.mk_num_nodes))

    ref = render_rows(flat, cfg, jnp.int32(0), 16)
    monkeypatch.setattr(mk, "_NODE_PACK_MB", 0.0)
    assert mk.node_table_packed(int(flat.mesh.mk_num_nodes))
    jax.clear_caches()  # _NODE_PACK_MB is not part of the jit cache key
    try:
        pal = render_rows(flat, cfg, jnp.int32(0), 16, backend="pallas",
                          interpret=True)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    assert float(np.asarray(pal.rays)) == float(np.asarray(ref.rays))
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id))


@pytest.mark.nightly
def test_hbm_streamed_mesh_matches_resident():
    """HBM-resident triangle tables (backend 'pallas_hbm', leaves streamed
    by per-visit DMA) must be BIT-IDENTICAL to the VMEM-resident megakernel:
    same kernel math, different table residency."""
    flat, cfg = _big_scene()
    res = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                      interpret=True)
    hbm = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas_hbm",
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(hbm.color), np.asarray(res.color))
    np.testing.assert_array_equal(
        np.asarray(hbm.gbuffer.obj_id), np.asarray(res.gbuffer.obj_id))
    assert float(np.asarray(hbm.rays)) == float(np.asarray(res.rays))
