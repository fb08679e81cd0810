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
def sample_flat(analytic_scene_path):
    scene = sanitize_scene(evaluate_scene(load_graph(analytic_scene_path)))
    return scene, flatten_scene(scene)


@pytest.mark.nightly
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


@pytest.mark.nightly
def test_megakernel_mesh_matches_jnp_wavefront():
    """Packet BVH traversal (closest/shadow/thickness) vs the jnp path."""
    from conftest import wine_glass_scene

    scene, ms = wine_glass_scene()
    flat = flatten_scene(scene, aspect=1.0, mesh_service=ms)
    cfg = make_config(scene, 64, 64)
    assert flat.mesh is not None

    ref = render_rows(flat, cfg, jnp.int32(0), 64)
    pal = render_rows(flat, cfg, jnp.int32(0), 64, backend="pallas", interpret=True)
    # Triangle t values agree only to ~1 ULP between the two formulations
    # (XLA fuses FMAs differently), so grazing glass paths can flip
    # discrete decisions: allow a small ray-count delta and a handful of
    # chaotic pixels rather than bit-exactness (analytic scenes ARE exact,
    # see test_megakernel_matches_jnp_wavefront).
    r_ref = float(np.asarray(ref.rays))
    r_pal = float(np.asarray(pal.rays))
    assert abs(r_pal - r_ref) / r_ref < 2e-3
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02, f"{(cd > 1e-3).mean():.4f} of pixels diverge"
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id)
    )
    nd = np.abs(
        np.asarray(pal.gbuffer.normal_roughness)
        - np.asarray(ref.gbuffer.normal_roughness)
    )
    assert np.percentile(nd, 99.9) < 2e-3


@pytest.mark.parametrize("h", [
    pytest.param(32, id="fast"),
    pytest.param(96, id="full", marks=pytest.mark.nightly),
])
def test_pallas_photon_gather_matches_jnp(h):
    """The Pallas chunked gather agrees with the reference-semantics hash
    walk (ops/photon.py) up to its documented deviations (corner cells,
    collision double-counts, cap ordering).

    Fast tier runs a 128x32 receiver grid (interpret-mode gather time is
    linear in pixels); nightly keeps the original 128x96."""
    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas import photon_gather
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, PlaneData, SceneData, SphereData,
    )

    scene = SceneData()
    glass = MaterialData(transmission=0.9, ior=1.5, roughness=0.0)
    scene.objects += [
        SphereData(position=np.array([0.0, 1.2, 0.0]), radius=0.8, material=glass),
        PlaneData(),
    ]
    scene.lights += [LightData(type=LightType.POINT,
                               position=np.array([0.0, 6.0, 0.0]), intensity=20.0)]
    scene.settings.enable_caustics = True
    flat = flatten_scene(scene, aspect=128 / 96)
    cfg = make_config(scene, 128, 96)
    pmap = photon_mod.emit_and_trace(flat, cfg.num_photons)
    assert int(np.asarray(pmap.count)) > 0

    w = 128
    n = h * w
    xs = np.linspace(-3, 3, w, dtype=np.float32)
    zs = np.linspace(-2, 4, h, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    pos = jnp.asarray(np.stack([gx.ravel(), np.zeros(n, np.float32), gz.ravel()], -1))
    nrm = jnp.asarray(np.tile(np.array([0, 1, 0], np.float32), (n, 1)))

    ref = np.asarray(photon_mod.gather(pmap, pos, nrm))
    pal = np.asarray(photon_gather.gather_pallas(
        pmap, pos, nrm, jnp.ones((n,), bool), h, w, interpret=True))
    # totals agree closely; a small fraction of pixels differ through the
    # documented cell-walk artifacts
    assert abs(pal.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.05
    rel = np.abs(ref - pal).max(-1) / np.maximum(ref.max(-1), 1e-3)
    assert (rel > 0.05).mean() < 0.02

    # eligibility mask zeroes lanes — including non-eligible lanes inside
    # a mixed tile whose positions sit within the gather radius (the kernel
    # must gate per lane, not rely on the caller re-masking)
    mixed = jnp.asarray((np.arange(n) % 3) == 0)
    palm = np.asarray(photon_gather.gather_pallas(
        pmap, pos, nrm, mixed, h, w, interpret=True))
    assert np.abs(palm[~np.asarray(mixed)]).max() == 0.0
    # eligible lanes are unaffected by the presence of masked neighbours
    np.testing.assert_allclose(palm[np.asarray(mixed)],
                               pal[np.asarray(mixed)], rtol=1e-5, atol=1e-6)

    pal0 = np.asarray(photon_gather.gather_pallas(
        pmap, pos, nrm, jnp.zeros((n,), bool), h, w, interpret=True))
    assert np.abs(pal0).max() == 0.0


@pytest.mark.nightly
def test_pallas_photon_trace_matches_jnp():
    """The Pallas photon-trace tile kernel follows the jnp bounce loop
    photon-for-photon (interpret mode). The RR chain is keyed on
    (photon index, depth), so both paths draw the same randoms; only
    ulp-level intersection differences at discrete boundaries (Fresnel
    choice, TIR, RR threshold) can flip individual photon fates."""
    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas.photon_trace import trace_photons_pallas
    from raytracevs_tpu.scene.data import (
        BoxData, LightData, LightType, MaterialData, PlaneData, SceneData,
        SphereData,
    )

    scene = SceneData()
    glass = MaterialData(transmission=0.9, ior=1.5, roughness=0.0)
    metal = MaterialData(metallic=1.0, roughness=0.3)
    scene.objects += [
        SphereData(position=np.array([0.0, 1.2, 0.0]), radius=0.8,
                   material=glass),
        BoxData(center=np.array([2.0, 0.6, 1.0]),
                size=np.array([0.5, 0.5, 0.5]), material=metal),
        PlaneData(),
    ]
    scene.lights += [
        # close to the glass sphere so a sizable solid angle refracts
        LightData(type=LightType.POINT, position=np.array([0.0, 2.8, 0.0]),
                  intensity=20.0),
        LightData(type=LightType.DIRECTIONAL,
                  position=np.array([2.0, 5.0, -1.0]), intensity=3.0),
    ]
    scene.settings.enable_caustics = True
    flat = flatten_scene(scene, aspect=1.0)

    n = 8192  # two tiles = two kernel programs
    origin, direction, color, power, alive = photon_mod._emit_photons(flat, n)
    ref = photon_mod._trace_photons_jnp(flat, origin, direction, color,
                                        power, alive)
    pal = trace_photons_pallas(flat, origin, direction, color, power, alive,
                               interpret=True)

    ref_mask = np.asarray(ref[4])
    pal_mask = np.asarray(pal[4])
    assert ref_mask.sum() > 100  # the scene genuinely stores caustics
    same = ref_mask == pal_mask
    assert same.mean() > 0.995, f"fates diverge at {(~same).mean():.4f}"
    both = ref_mask & pal_mask
    for c, atol in ((0, 5e-3), (1, 1e-4), (2, 1e-5), (3, 1e-4)):
        # pos tolerates ulp drift amplified through two refractions and a
        # plane intersection (rtol covers grazing rays that land far out
        # on the infinite plane); dir/color/power accumulate far less
        a = np.asarray(ref[c])[both]
        b = np.asarray(pal[c])[both]
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3,
                                   err_msg=f"store field {c}")

    # end-to-end: the pallas-traced PhotonMap feeds the same gather
    pm = photon_mod.emit_and_trace(flat, n, backend="pallas", interpret=True)
    pm_ref = photon_mod.emit_and_trace(flat, n, backend="jnp")
    assert abs(int(np.asarray(pm.count)) - int(np.asarray(pm_ref.count))) \
        <= max(4, 0.005 * int(np.asarray(pm_ref.count)))


@pytest.mark.nightly
def test_megakernel_multi_instance_mesh_matches_jnp():
    """Two glass instances (i_cap > 1): the shadow loop's per-triangle
    instance-row loads (not the single-instance hoist) must stay in
    lockstep with the jnp path, including per-instance Beer factors."""
    import numpy as np

    from conftest import wine_glass_scene
    from raytracevs_tpu.scene.data import MaterialData, MeshObjectData
    from raytracevs_tpu.scene.transform import Transform

    scene, ms = wine_glass_scene()
    tinted = MaterialData(
        base_color=np.array([0.9, 0.95, 1.0, 1.0]), transmission=1.0,
        ior=1.1, roughness=0.05,
        absorption=np.array([0.1, 0.05, 0.0]),
    )
    scene.objects.insert(1, MeshObjectData(
        mesh_name="WineGlass",
        transform=Transform(position=np.array([1.2, 0.0, 0.3]),
                            scale=np.array([1.5, 1.5, 1.5])),
        material=tinted,
    ))
    flat = flatten_scene(scene, aspect=1.0, mesh_service=ms)
    cfg = make_config(scene, 64, 64)
    assert flat.mesh is not None
    assert flat.mesh.inst_transmission.shape[0] == 2

    ref = render_rows(flat, cfg, jnp.int32(0), 64)
    pal = render_rows(flat, cfg, jnp.int32(0), 64, backend="pallas",
                      interpret=True)
    r_ref = float(np.asarray(ref.rays))
    r_pal = float(np.asarray(pal.rays))
    assert abs(r_pal - r_ref) / r_ref < 2e-3
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02, f"{(cd > 1e-3).mean():.4f} diverge"
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id)
    )


@pytest.mark.nightly
def test_megakernel_nine_instance_fallback_matches_jnp():
    """More than 8 instances falls back to the per-triangle dynamic
    inst_tbl row load — the only instance path the preload doesn't cover."""
    import numpy as np

    from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData, SceneData,
    )
    from raytracevs_tpu.scene.transform import Transform
    import tempfile

    # one quad, instanced 9x in a row with alternating opaque/glass
    verts = np.zeros((4, 8), np.float32)
    verts[:, 0:3] = [[-.4, 0, -.4], [.4, 0, -.4], [.4, 0, .4], [-.4, 0, .4]]
    verts[:, 4:7] = [0, 1, 0]
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("Quad", CachedMesh(
        "Quad", verts.reshape(-1), np.array([0, 1, 2, 0, 2, 3], np.uint32),
        np.array([-.4, 0, -.4]), np.array([.4, 0, .4])))

    scene = SceneData()
    scene.camera.position = np.array([0.0, 3.0, -4.0])
    scene.camera.look_at = np.array([0.0, 0.5, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    for i in range(9):
        if i % 2:
            mat = MaterialData(base_color=np.array([0.9, 0.9, 1.0, 1.0]),
                               transmission=1.0, ior=1.2,
                               absorption=np.array([0.02 * i, 0.01, 0.0]))
        else:
            mat = MaterialData(base_color=np.array([0.8, 0.4, 0.3, 1.0]),
                               roughness=0.6)
        scene.objects.append(MeshObjectData(
            mesh_name="Quad", material=mat,
            transform=Transform(position=np.array([(i - 4) * 0.9, 0.4 + 0.1 * i, 0.0])),
        ))
    scene.objects.append(PlaneData())
    scene.lights.append(LightData(type=LightType.POINT,
                                  position=np.array([2.0, 6.0, -2.0]),
                                  intensity=12.0))
    flat = flatten_scene(scene, aspect=64 / 32, mesh_service=ms)
    cfg = make_config(scene, 64, 32)
    assert flat.mesh is not None and flat.mesh.inst_transmission.shape[0] == 9

    ref = render_rows(flat, cfg, jnp.int32(0), 32)
    pal = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                      interpret=True)
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02
    np.testing.assert_array_equal(
        np.asarray(pal.gbuffer.obj_id), np.asarray(ref.gbuffer.obj_id)
    )


def test_absorbing_mesh_glass_fused_thickness_matches_jnp():
    """Absorbing mesh glass: the deferred (fused) thickness path.

    The refract child's closest walk resolves the same-instance thickness
    (mesh_closest_k thick_inst / bvh.traverse_closest thick_inst) and the
    Beer factor is applied at the child's iteration instead of at spawn —
    both backends must agree, and the absorption must actually tint
    (catches a fused path that silently returns beer=1). Also exercises
    the shadow blocked-seed (the opaque sphere shadows lanes whose
    segments cross the glass BVH)."""
    import tempfile

    from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData,
        SceneData, SphereData,
    )
    from raytracevs_tpu.scene.transform import Transform
    from test_big_mesh import _uv_sphere

    verts, indices = _uv_sphere(rings=9, segs=9, radius=0.7)
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("GlassBall", CachedMesh(
        name="GlassBall", vertices=verts, indices=indices,
        bounds_min=np.array([-0.7, -0.7, -0.7]),
        bounds_max=np.array([0.7, 0.7, 0.7]),
    ))

    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.7, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 4
    glass = MaterialData(
        base_color=np.array([0.95, 0.95, 0.95, 1.0]), transmission=1.0,
        ior=1.2, roughness=0.0,
        absorption=np.array([0.6, 0.15, 0.05]),  # non-uniform: channel swaps show
    )
    opaque = MaterialData(base_color=np.array([0.8, 0.8, 0.8, 1.0]), roughness=0.4)
    scene.objects += [
        MeshObjectData(mesh_name="GlassBall", material=glass,
                       transform=Transform(position=np.array([0.0, 0.7, 0.0]))),
        SphereData(position=np.array([1.4, 1.2, -0.6]), radius=0.4,
                   material=opaque),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([2.5, 5.0, -2.0]),
                  intensity=12.0),
        LightData(type=LightType.DIRECTIONAL,
                  direction=np.array([0.4, -1.0, 0.2]), intensity=0.7),
        LightData(type=LightType.AMBIENT, color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    # 64x32 (one megakernel tile): interpret-mode time halves vs 64x64
    # while every covered path (fused thickness, blocked-seed, Beer
    # channel swaps) still fires
    flat = flatten_scene(scene, aspect=64 / 32, mesh_service=ms)
    cfg = make_config(scene, 64, 32)
    assert flat.mesh is not None
    assert cfg.any_absorption

    ref = render_rows(flat, cfg, jnp.int32(0), 32)
    pal = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                      interpret=True)
    r_ref = float(np.asarray(ref.rays))
    assert abs(float(np.asarray(pal.rays)) - r_ref) / r_ref < 2e-3
    cd = np.abs(np.asarray(pal.color) - np.asarray(ref.color)).max(axis=-1)
    assert (cd > 1e-3).mean() < 0.02, f"{(cd > 1e-3).mean():.4f} of pixels diverge"

    # Absorption sanity: zeroing the absorption must brighten the glass —
    # the deferred Beer really fires (jnp oracle, cheap at this size).
    scene.objects[0].material.absorption = np.array([0.0, 0.0, 0.0])
    flat0 = flatten_scene(scene, aspect=64 / 32, mesh_service=ms)
    ref0 = render_rows(flat0, cfg, jnp.int32(0), 32)
    delta = np.asarray(ref0.color) - np.asarray(ref.color)
    assert float(delta.max()) > 0.01, "absorption had no effect on the render"


@pytest.mark.nightly
def test_shadow_fat_walk_bit_identical(monkeypatch):
    """The shadow fat-leaf walk (mesh_shadow_count_k RTVS_MK_SHADOW_FAT)
    — OPT-IN machinery (default off), so its 2.5-minute interpret-mode
    bit-identity run lives in the nightly tier.
    must be BIT-identical to the fine walk: a fat subtree test covers
    exactly the union of its leaves' real triangles (pad slots are inert
    degenerate triangles), a lane that misses an inner box cannot hit its
    triangles, and counts/occ/blocked are order-independent reductions."""
    import tempfile

    from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
    from raytracevs_tpu.ops.pallas import megakernel as mk
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData,
        SceneData, SphereData,
    )
    from raytracevs_tpu.scene.transform import Transform
    from test_big_mesh import _uv_sphere

    verts, indices = _uv_sphere(rings=9, segs=9, radius=0.7)
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("GlassBall", CachedMesh(
        name="GlassBall", vertices=verts, indices=indices,
        bounds_min=np.array([-0.7, -0.7, -0.7]),
        bounds_max=np.array([0.7, 0.7, 0.7]),
    ))

    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.7, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 3
    glass = MaterialData(
        base_color=np.array([0.95, 0.95, 0.95, 1.0]), transmission=0.9,
        ior=1.2, roughness=0.0)
    opaque = MaterialData(base_color=np.array([0.8, 0.8, 0.8, 1.0]),
                          roughness=0.4)
    scene.objects += [
        MeshObjectData(mesh_name="GlassBall", material=glass,
                       transform=Transform(position=np.array([0.0, 0.7, 0.0]))),
        SphereData(position=np.array([1.4, 1.2, -0.6]), radius=0.4,
                   material=opaque),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([2.5, 5.0, -2.0]),
                  intensity=12.0),
        LightData(type=LightType.DIRECTIONAL,
                  direction=np.array([0.4, -1.0, 0.2]), intensity=0.7),
        LightData(type=LightType.AMBIENT, color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    flat = flatten_scene(scene, aspect=64 / 32, mesh_service=ms)
    cfg = make_config(scene, 64, 32)
    assert flat.mesh is not None

    monkeypatch.setattr(mk, "_SHADOW_FAT", True)
    jax.clear_caches()
    fat = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                      interpret=True)
    monkeypatch.setattr(mk, "_SHADOW_FAT", False)
    jax.clear_caches()
    fine = render_rows(flat, cfg, jnp.int32(0), 32, backend="pallas",
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(fat.color),
                                  np.asarray(fine.color))
    assert float(np.asarray(fat.rays)) == float(np.asarray(fine.rays))
