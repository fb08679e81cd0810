"""BVH build + traversal tests (native SAH and numpy fallback)."""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.io.fbx import load_fbx
from raytracevs_tpu.ops import bvh


@pytest.fixture(scope="module")
def glass_tris():
    m = load_fbx("/root/reference/Resource/Model/WineGlass.fbx")
    tris = m.indices.reshape(-1, 3)
    return (
        m.vertices[tris[:, 0]], m.vertices[tris[:, 1]], m.vertices[tris[:, 2]],
        m.normals[tris[:, 0]], m.normals[tris[:, 1]], m.normals[tris[:, 2]],
        np.zeros(len(tris), np.int32),
    )


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(np.array([[0, 0.5, -3.0]] * n) + rng.randn(n, 3) * 0.2, jnp.float32)
    d = jnp.asarray(rng.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_fbx_import_sane(glass_tris):
    v0 = glass_tris[0]
    assert len(v0) == 5904
    n0 = glass_tris[3]
    np.testing.assert_allclose(np.linalg.norm(n0, axis=1), 1.0, atol=1e-4)


def test_native_matches_python_builder(glass_tris):
    b_native = bvh.build_bvh(*glass_tris, use_native=True)
    b_python = bvh.build_bvh(*glass_tris, use_native=False)
    mesh_n = bvh.to_device(b_native, np.array([1.0]), np.array([[0.0, 0, 0]]))
    mesh_p = bvh.to_device(b_python, np.array([1.0]), np.array([[0.0, 0, 0]]))
    o, d = _rays(128)
    tmin = jnp.full((128,), 0.001, jnp.float32)
    tmax = jnp.full((128,), 1e4, jnp.float32)
    h1 = bvh.traverse_closest(mesh_n, o, d, tmin, tmax)
    h2 = bvh.traverse_closest(mesh_p, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], atol=1e-5)


def test_traversal_matches_bruteforce(glass_tris):
    b = bvh.build_bvh(*glass_tris)
    mesh = bvh.to_device(b, np.array([1.0]), np.array([[0.0, 0, 0]]))
    o, d = _rays(32, seed=7)
    tmin = jnp.full((32,), 0.001, jnp.float32)
    tmax = jnp.full((32,), 1e4, jnp.float32)
    hit = bvh.traverse_closest(mesh, o, d, tmin, tmax)
    on = np.asarray(o)
    dn = np.asarray(d)
    for i in range(32):
        pv = np.cross(dn[i], b.edge2)
        det = (b.edge1 * pv).sum(1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = on[i] - b.v0
        u = (tv * pv).sum(1) * inv
        qv = np.cross(tv, b.edge1)
        v = (dn[i] * qv).sum(1) * inv
        t = (b.edge2 * qv).sum(1) * inv
        mask = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0.001)
        ref_t = t[mask].min() if mask.any() else np.inf
        got_t = float(hit.t[i]) if bool(hit.hit[i]) else np.inf
        if np.isinf(ref_t):
            assert np.isinf(got_t)
        else:
            assert got_t == pytest.approx(ref_t, rel=1e-5)


def test_shadow_translucency_counts_crossings(glass_tris):
    # instance transmission 0.5: visibility = 0.5^crossings
    b = bvh.build_bvh(*glass_tris)
    mesh = bvh.to_device(b, np.array([0.5]), np.array([[0.0, 0.0, 0.0]]))
    n = 8
    o = jnp.asarray([[0.0, 0.5, -3.0]] * n, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * n, jnp.float32)
    vis, color, occ = bvh.traverse_shadow(mesh, o, d, jnp.full((n,), 100.0))
    v = float(vis[0])
    # the ray crosses the glass wall multiple times -> 0 < vis < 1
    assert 0.0 < v < 1.0
    k = round(np.log(v) / np.log(0.5))
    assert v == pytest.approx(0.5 ** k, rel=1e-4)


def test_native_fnv1a_known_value():
    from raytracevs_tpu.io.native import fnv1a

    h = fnv1a(b"hello")
    if h is None:
        pytest.skip("native library unavailable")
    assert h == 0xA430D84680AABD0B


class _FakeMesh:
    def __init__(self, positions, normals, indices):
        self.positions = positions
        self.normals = normals
        self.indices = indices


def _quad_mesh():
    # unit square in the XZ plane at y=0, facing +Y
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    nrm = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    return _FakeMesh(pos, nrm, idx)


def test_blas_cache_skips_sah_on_transform_edit():
    """Transform edits must not re-run the SAH builder: the BLAS is cached
    by mesh name (AccelerationStructure.cpp:560-663) and instances only
    retransform (:665-848)."""
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, SceneData,
    )
    from raytracevs_tpu.scene.flatten import flatten_scene
    from raytracevs_tpu.scene.transform import Transform, euler_deg_to_quat

    mesh = _quad_mesh()

    class _Svc:
        def get_mesh(self, name):
            return mesh if name == "Quad" else None

    def scene_with(transform):
        s = SceneData()
        s.objects.append(MeshObjectData(mesh_name="Quad", transform=transform,
                                        material=MaterialData()))
        s.lights.append(LightData(type=LightType.POINT,
                                  position=np.array([0.0, 5.0, 0.0]), intensity=5.0))
        return s

    cache = bvh.BLASCache()
    flatten_scene(scene_with(Transform()), mesh_service=_Svc(), blas_cache=cache)
    assert cache.build_count == 1
    moved = Transform(position=np.array([2.0, 0.5, 1.0]),
                      rotation=euler_deg_to_quat([0, 45, 0]),
                      scale=np.array([2.0, 1.0, 1.0]))
    flat = flatten_scene(scene_with(moved), mesh_service=_Svc(), blas_cache=cache)
    assert cache.build_count == 1  # no SAH rebuild on transform edit
    # the transformed BVH still bounds the transformed geometry
    v0 = np.asarray(flat.mesh.v0)
    lo = np.asarray(flat.mesh.bbox_min)[0]
    hi = np.asarray(flat.mesh.bbox_max)[0]
    assert (v0 >= lo - 1e-4).all() and (v0 <= hi + 1e-4).all()


def test_blas_cache_rebuilds_on_content_change():
    """Same mesh NAME, different geometry -> the cache must rebuild, not
    serve the stale BLAS (content fingerprint, not name-only keying)."""
    mesh_a = _quad_mesh()
    pos_b = mesh_a.positions.copy()
    pos_b[:, 0] *= 3.0  # stretched quad under the same name
    mesh_b = _FakeMesh(pos_b, mesh_a.normals, mesh_a.indices)

    cache = bvh.BLASCache()
    blas_a = cache.get("Quad", mesh_a)
    assert cache.build_count == 1
    assert cache.get("Quad", mesh_a) is blas_a  # unchanged content: cache hit
    assert cache.build_count == 1
    blas_b = cache.get("Quad", mesh_b)
    assert cache.build_count == 2  # content changed: rebuilt
    assert float(blas_b.bbox_max[0][0]) > float(blas_a.bbox_max[0][0]) + 1.0


def test_multi_instance_forest_traversal():
    """Two instances of the same mesh chain into one traversable forest and
    both are hit at their transformed locations."""
    mesh = _quad_mesh()
    cache = bvh.BLASCache()
    blas = cache.get("Quad", mesh)
    assert cache.build_count == 1
    cache.get("Quad", mesh)
    assert cache.build_count == 1  # cached by name

    from raytracevs_tpu.scene.transform import Transform

    t0 = Transform()  # at origin
    t1 = Transform(position=np.array([5.0, 0.0, 0.0]))
    combined = bvh.combine_blas([
        bvh.transform_blas(blas, t0.matrix(), 0),
        bvh.transform_blas(blas, t1.matrix(), 1),
    ])
    dev = bvh.to_device(combined, np.zeros(2, np.float32), np.zeros((2, 3), np.float32))

    o = jnp.asarray(np.array([[0.5, 1.0, 0.5], [5.5, 1.0, 0.5]], np.float32))
    d = jnp.asarray(np.tile(np.array([0, -1, 0], np.float32), (2, 1)))
    hit = bvh.traverse_closest(dev, o, d, 1e-3, 100.0)
    assert np.asarray(hit.hit).all()
    np.testing.assert_allclose(np.asarray(hit.t), [1.0, 1.0], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit.inst), [0, 1])

    # a ray missing both instances walks the whole chain and reports no hit
    o2 = jnp.asarray(np.array([[2.5, 1.0, 5.5]], np.float32))
    d2 = jnp.asarray(np.array([[0, -1, 0]], np.float32))
    hit2 = bvh.traverse_closest(dev, o2, d2, 1e-3, 100.0)
    assert not np.asarray(hit2.hit).any()


def test_collapse_leaves_traversal_equivalence(glass_tris):
    """The fat-leaf tree must find exactly the same closest hits."""
    built = bvh.build_bvh(*glass_tris)
    fat = bvh.collapse_leaves(built, bvh.MK_LEAF_SIZE)
    assert len(fat.bbox_min) < len(built.bbox_min) / 3
    assert fat.tri_count.max() <= max(bvh.MK_LEAF_SIZE, built.tri_count.max())
    assert fat.tri_count[fat.tri_count > 0].sum() == len(built.v0)
    # every leaf range starts 8-aligned (block-load contract) and the
    # trailing pad keeps a full-leaf load in bounds
    assert (fat.tri_start % 8 == 0).all()
    pad = -(-bvh.MK_LEAF_SIZE // 8) * 8
    assert fat.tri_start.max() + pad <= len(fat.v0)

    dev_fine = bvh.to_device(built, np.zeros(1, np.float32), np.zeros((1, 3), np.float32))
    dev_fat = bvh.to_device(fat, np.zeros(1, np.float32),
                            np.zeros((1, 3), np.float32), mk_built=fat)

    o, d = _rays(512, seed=11)
    h1 = bvh.traverse_closest(dev_fine, o, d, 1e-3, 100.0)
    old = bvh.LEAF_SIZE
    try:
        bvh.LEAF_SIZE = bvh.MK_LEAF_SIZE  # jnp walk unroll must cover fat leaves
        h2 = bvh.traverse_closest(dev_fat, o, d, 1e-3, 100.0)
    finally:
        bvh.LEAF_SIZE = old
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), atol=1e-6)


def test_packed_subtree_ranges_multi_instance():
    """pack_mesh's cummax/cummin recovery of per-node PADDED subtree
    triangle ranges (node-row lanes 10/11, the shadow fat-leaf walk's
    input) vs a recursive ground truth — across combine_blas instance
    boundaries (offset tri ranges, instance-root chains), the riskiest
    path (ADVICE r4 #1)."""
    from raytracevs_tpu.ops.pallas.megakernel import pack_mesh

    rng = np.random.default_rng(5)
    # an irregular soup so the SAH tree has real depth and uneven leaves
    n_tri = 73
    base = rng.normal(size=(n_tri, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.normal(scale=0.3, size=(n_tri, 3)).astype(np.float32)
    v2 = base + rng.normal(scale=0.3, size=(n_tri, 3)).astype(np.float32)
    nrm = np.cross(v1 - v0, v2 - v0).astype(np.float32)

    blas = []
    for inst in range(4):
        m4 = np.eye(4, dtype=np.float32)
        m4[3, :3] = [inst * 3.0, 0.0, 0.0]
        b = bvh.build_bvh(v0, v1, v2, nrm, nrm, nrm,
                          np.zeros(n_tri, np.int32))
        b = bvh.transform_blas(b, m4, inst)
        blas.append(bvh.collapse_leaves(b, bvh.MK_LEAF_SIZE,
                                        align=bvh.MK_LEAF_ALIGN))
    forest = bvh.combine_blas(blas)
    mesh = bvh.to_device(forest, np.zeros(4, np.float32),
                         np.zeros((4, 3), np.float32), mk_built=forest)
    nodes_fi, _, _, _ = pack_mesh(mesh)
    nodes_fi = np.asarray(nodes_fi)
    assert nodes_fi.shape[1] == 16  # small forest stays on the flat layout

    nn = mesh.mk_num_nodes
    miss = np.asarray(mesh.mk_miss_next)
    start = np.asarray(mesh.mk_tri_start).astype(np.int64)
    count = np.asarray(mesh.mk_tri_count).astype(np.int64)
    got_start = nodes_fi[:, 10].astype(np.int64)
    got_cnt = nodes_fi[:, 11].astype(np.int64)

    real_tris = sum(len(b.v0) for b in blas)  # includes per-BLAS pads
    for i in range(nn):
        end = nn if miss[i] < 0 else int(miss[i])
        leaves = [j for j in range(i, end) if count[j] > 0]
        assert leaves, f"node {i} subtree [{i},{end}) has no leaves"
        s = min(start[j] for j in leaves)
        e = max(((start[j] + count[j] + 7) // 8) * 8 for j in leaves)
        assert got_start[i] == s, f"node {i}: start {got_start[i]} != {s}"
        assert got_cnt[i] == e - s, f"node {i}: cnt {got_cnt[i]} != {e - s}"
        # the padded union must stay inside the table
        assert e <= mesh.mk_num_tris

    # leaf rows: sub range == own padded range (the fat walk's leaf case)
    for i in range(nn):
        if count[i] > 0 and (nn if miss[i] < 0 else int(miss[i])) == i + 1:
            assert got_start[i] == start[i]
            assert got_cnt[i] == ((start[i] + count[i] + 7) // 8) * 8 - start[i]
