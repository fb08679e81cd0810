"""Intersection kernels vs analytic cases (Intersection.hlsl semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.scene.data import (
    BoxData, LightData, LightType, MaterialData, PlaneData, SceneData, SphereData,
)
from raytracevs_tpu.scene.flatten import flatten_scene
from raytracevs_tpu.ops import intersect


def _flat(objects, lights=()):
    scene = SceneData(objects=list(objects), lights=list(lights))
    return flatten_scene(scene)


def _trace(scene, origin, direction):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    tmin = jnp.asarray([0.001], jnp.float32)
    tmax = jnp.asarray([10000.0], jnp.float32)
    return intersect.trace_closest(scene, o, d, tmin, tmax)


def test_sphere_hit_distance():
    s = _flat([SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0)])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)
    assert int(h.obj_type[0]) == 0


def test_sphere_inside_hits_exit():
    s = _flat([SphereData(position=np.array([0.0, 0.0, 0.0]), radius=2.0)])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-4)


def test_sphere_miss():
    s = _flat([SphereData(position=np.array([0.0, 5.0, 5.0]), radius=1.0)])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert not bool(h.hit[0])


def test_plane_hit():
    s = _flat([PlaneData(position=np.zeros(3), normal=np.array([0.0, 1.0, 0.0]))])
    h = _trace(s, [0, 2, 0], [0, -1, 0])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-5)
    assert int(h.obj_type[0]) == 1


def test_plane_parallel_miss():
    s = _flat([PlaneData(position=np.zeros(3), normal=np.array([0.0, 1.0, 0.0]))])
    h = _trace(s, [0, 2, 0], [1, 0, 0])
    assert not bool(h.hit[0])


def test_box_axis_aligned():
    s = _flat([BoxData(center=np.array([0.0, 0.0, 5.0]), size=np.array([1.0, 1.0, 1.0]))])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)
    assert int(h.obj_type[0]) == 2


def test_box_from_inside_hits_far_face():
    s = _flat([BoxData(center=np.array([0.0, 0.0, 0.0]), size=np.array([1.0, 1.0, 1.0]))])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(1.0, abs=1e-4)


def test_box_rotated_45deg():
    from raytracevs_tpu.scene.transform import euler_deg_to_quat, obb_axes_from_quat

    q = euler_deg_to_quat([0, 45, 0])
    ax, ay, az = obb_axes_from_quat(q)
    s = _flat([
        BoxData(center=np.array([0.0, 0.0, 5.0]), size=np.array([1.0, 1.0, 1.0]),
                axis_x=ax, axis_y=ay, axis_z=az)
    ])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert bool(h.hit[0])
    # Corner-on: the box extends sqrt(2) toward the ray
    assert float(h.t[0]) == pytest.approx(5.0 - np.sqrt(2.0), abs=1e-3)


def test_closest_hit_picks_nearest():
    s = _flat([
        SphereData(position=np.array([0.0, 0.0, 10.0]), radius=1.0),
        SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0),
    ])
    h = _trace(s, [0, 0, 0], [0, 0, 1])
    assert int(h.obj_index[0]) == 1
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)


def test_self_skip():
    s = _flat([SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0)])
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    tmin = jnp.asarray([0.001], jnp.float32)
    tmax = jnp.asarray([10000.0], jnp.float32)
    h = intersect.trace_closest(
        s, o, d, tmin, tmax,
        skip_type=jnp.asarray([0], jnp.int32), skip_index=jnp.asarray([0], jnp.int32),
    )
    assert not bool(h.hit[0])


def test_surface_normals():
    s = _flat([
        SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0),
        PlaneData(position=np.zeros(3), normal=np.array([0.0, 1.0, 0.0])),
        BoxData(center=np.array([5.0, 0.0, 0.0]), size=np.array([1.0, 1.0, 1.0])),
    ])
    o = jnp.asarray([[0, 0, 0], [0, 2, 0], [0, 0, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, -1, 0], [1, 0, 0]], jnp.float32)
    tmin = jnp.full((3,), 0.001, jnp.float32)
    tmax = jnp.full((3,), 10000.0, jnp.float32)
    h = intersect.trace_closest(s, o, d, tmin, tmax)
    pos, n, front = intersect.surface_normal(s, h, o, d)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-4)  # sphere front
    np.testing.assert_allclose(np.asarray(n[1]), [0, 1, 0], atol=1e-5)  # plane
    np.testing.assert_allclose(np.asarray(n[2]), [-1, 0, 0], atol=1e-4)  # box -X face
    assert np.asarray(front).all()


def test_shadow_opaque_blocks():
    s = _flat([SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0)])
    vis, color, occ = intersect.trace_shadow(
        s, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), jnp.asarray([100.0], jnp.float32)
    )
    assert float(vis[0]) == 0.0
    np.testing.assert_allclose(np.asarray(color[0]), [0, 0, 0])
    assert float(occ[0]) == pytest.approx(4.0, abs=1e-4)


def test_shadow_translucent_tints():
    m = MaterialData(transmission=0.8, absorption=np.array([0.0, 2.0, 2.0]))
    s = _flat([SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0, material=m)])
    # ShadowAbsorptionScale default 4.0; thickness proxy 1.0
    vis, color, occ = intersect.trace_shadow(
        s, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), jnp.asarray([100.0], jnp.float32)
    )
    assert float(vis[0]) == pytest.approx(0.8)
    expected = np.exp(-np.array([0.0, 2.0, 2.0]) * 1.0 * 4.0)
    np.testing.assert_allclose(np.asarray(color[0]), expected, rtol=1e-5)


def test_shadow_beyond_range_visible():
    s = _flat([SphereData(position=np.array([0.0, 0.0, 50.0]), radius=1.0)])
    vis, _, _ = intersect.trace_shadow(
        s, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), jnp.asarray([10.0], jnp.float32)
    )
    assert float(vis[0]) == 1.0


def test_thickness_same_object():
    s = _flat([
        SphereData(position=np.array([0.0, 0.0, 5.0]), radius=1.0),
        SphereData(position=np.array([0.0, 0.0, 5.5]), radius=0.2),
    ])
    # From the entry point of sphere 0, thickness along +z = diameter.
    origin = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit, t = intersect.trace_thickness(
        s, origin, d, jnp.asarray([0], jnp.int32), jnp.asarray([0], jnp.int32)
    )
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(2.0, abs=1e-3)  # skips the inner sphere
