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
