"""Fused dual-light shadow walk (mesh_shadow2_count_k) equivalence.

The fused walk must be BIT-identical to the sequential per-light count
walks (RTVS_MK_SHADOW_FUSE=0): per-ray triangle tests stay gated by each
ray's own box hit, counts/occ-min are traversal-order independent, and
the RNG stream is consumed in the same light-by-light order
(AnyHit_Shadow.hlsl semantics; see megakernel.shadow_trace2_k).
"""
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
from raytracevs_tpu.scene.data import (
    LightData, LightType, MaterialData, MeshObjectData, PlaneData,
    SceneData, SphereData,
)
from raytracevs_tpu.scene.transform import Transform
from raytracevs_tpu.scene.flatten import flatten_scene, make_config
from raytracevs_tpu.scene.sanitize import sanitize_scene


def _mesh_scene(opaque_mesh=False, h=64):
    from test_big_mesh import _uv_sphere

    verts, indices = _uv_sphere(rings=9, segs=9, radius=0.7)
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("GlassBall", CachedMesh(
        name="GlassBall", vertices=verts, indices=indices,
        bounds_min=np.array([-0.7, -0.7, -0.7]),
        bounds_max=np.array([0.7, 0.7, 0.7]),
    ))

    glass = MaterialData(
        base_color=np.array([0.95, 0.95, 0.95, 1.0]), transmission=1.0,
        ior=1.2, roughness=0.0,
        absorption=np.array([0.5, 0.2, 0.05]),
    )
    if opaque_mesh:
        # Opaque mesh: the walk's end-search (AcceptHitAndEndSearch) mask
        # fires MID-walk — the ordering-sensitive case.
        glass = MaterialData(base_color=np.array([0.7, 0.7, 0.8, 1.0]),
                             roughness=0.3)
    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.7, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    scene.objects += [
        MeshObjectData(mesh_name="GlassBall", material=glass,
                       transform=Transform(position=np.array([0.0, 0.7, 0.0]))),
        SphereData(position=np.array([1.4, 1.2, -0.6]), radius=0.4,
                   material=MaterialData(roughness=0.4)),
        PlaneData(),
    ]
    # Two shadow-casting lights -> two dominant lights -> the fused pair
    # path; one soft (radius > 0) so soft sampling also pairs.
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([2.5, 5.0, -2.0]),
                  intensity=12.0, radius=0.35, soft_shadow_samples=2.0),
        LightData(type=LightType.DIRECTIONAL,
                  direction=np.array([0.4, -1.0, 0.2]), intensity=0.8),
        LightData(type=LightType.AMBIENT, color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    scene = sanitize_scene(scene)
    flat = flatten_scene(scene, aspect=64 / h, mesh_service=ms)
    cfg = make_config(scene, 64, h, max_soft_samples=2)
    assert flat.mesh is not None
    return flat, cfg


def _render(flat, cfg, monkeypatch, fuse):
    from raytracevs_tpu.ops.pallas import megakernel as mk
    from raytracevs_tpu.ops.render import render_rows

    monkeypatch.setattr(mk, "_SHADOW_FUSE", fuse)
    out = render_rows(flat, cfg, jnp.int32(0), cfg.height, backend="pallas",
                      interpret=True)
    return np.asarray(out.color), float(np.asarray(out.rays))


# The fused walk is OPT-IN (default off: falsified as a perf win, kept
# for union-dominated workloads) — all bit-identity cases are nightly
# (the glass-fast case alone cost 153 s of the fast tier on one core).
@pytest.mark.parametrize("opaque_mesh,h", [
    pytest.param(False, 32, id="glass-fast", marks=pytest.mark.nightly),
    pytest.param(True, 64, id="opaque-full", marks=pytest.mark.nightly),
    pytest.param(False, 64, id="glass-full", marks=pytest.mark.nightly),
])
def test_fused_dual_light_walk_bit_identical(monkeypatch, opaque_mesh, h):
    flat, cfg = _mesh_scene(opaque_mesh=opaque_mesh, h=h)
    c_fused, r_fused = _render(flat, cfg, monkeypatch, True)
    c_seq, r_seq = _render(flat, cfg, monkeypatch, False)
    assert r_fused == r_seq
    np.testing.assert_array_equal(c_fused, c_seq)


# The INTERLEAVED dual walk (separate node pointers, no union steering)
# is DEFAULT-ON, so its bit-identity guard runs in the fast tier at the
# smallest shape; nightly covers the opaque end-search case at full size.
@pytest.mark.parametrize("opaque_mesh,h", [
    pytest.param(False, 32, id="glass-fast"),
    pytest.param(True, 64, id="opaque-full", marks=pytest.mark.nightly),
])
def test_interleaved_dual_walk_bit_identical(monkeypatch, opaque_mesh, h):
    """Modes 1 (pairwise lights) and 2 (all samples x lights, the
    default) both bit-match the sequential walks."""
    from raytracevs_tpu.ops.pallas import megakernel as mk

    flat, cfg = _mesh_scene(opaque_mesh=opaque_mesh, h=h)

    def render(mode):
        from raytracevs_tpu.ops.render import render_rows

        monkeypatch.setattr(mk, "_SHADOW_FUSE", False)
        monkeypatch.setattr(mk, "_SHADOW_ILV_MODE", mode)
        monkeypatch.setattr(mk, "_SHADOW_ILV", mode >= 1)
        out = render_rows(flat, cfg, jnp.int32(0), cfg.height,
                          backend="pallas", interpret=True)
        return np.asarray(out.color), float(np.asarray(out.rays))

    c_seq, r_seq = render(0)
    for mode in (1, 2):
        c_ilv, r_ilv = render(mode)
        assert r_ilv == r_seq, f"mode {mode}"
        np.testing.assert_array_equal(c_ilv, c_seq, err_msg=f"mode {mode}")
