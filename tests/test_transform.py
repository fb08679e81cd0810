"""Transform math tests vs System.Numerics conventions (Transform.cs)."""
import math

import numpy as np

from raytracevs_tpu.scene.transform import (
    Transform,
    euler_deg_to_quat,
    obb_axes_from_quat,
    quat_rotation_matrix,
    rotate_vector,
)


def test_identity_quat():
    q = euler_deg_to_quat([0, 0, 0])
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-12)


def test_yaw_90():
    # Yaw 90° about +Y: +Z -> +X under System.Numerics CreateFromYawPitchRoll.
    q = euler_deg_to_quat([0, 90, 0])
    v = rotate_vector([0, 0, 1], q)
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-12)


def test_pitch_90():
    # Pitch 90° about +X: +Y -> +Z.
    q = euler_deg_to_quat([90, 0, 0])
    v = rotate_vector([0, 1, 0], q)
    np.testing.assert_allclose(v, [0, 0, 1], atol=1e-12)


def test_roll_90():
    # Roll 90° about +Z: +X -> +Y.
    q = euler_deg_to_quat([0, 0, 90])
    v = rotate_vector([1, 0, 0], q)
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-12)


def test_euler_roundtrip():
    t = Transform.identity()
    t.euler_angles = [30, 45, 60]
    np.testing.assert_allclose(t.euler_angles, [30, 45, 60], atol=1e-6)


def test_rotation_matrix_orthonormal():
    q = euler_deg_to_quat([10, 20, 30])
    r = quat_rotation_matrix(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(r) - 1.0) < 1e-12


def test_obb_axes_are_matrix_rows():
    """BoxNode extracts *columns* of the row-vector matrix == rows of R."""
    q = euler_deg_to_quat([0, 45, 0])
    ax, ay, az = obb_axes_from_quat(q)
    r = quat_rotation_matrix(q)
    np.testing.assert_allclose(ax, r[0], atol=1e-12)
    np.testing.assert_allclose(ay, r[1], atol=1e-12)
    np.testing.assert_allclose(az, r[2], atol=1e-12)


def test_combine_translation():
    local = Transform(position=np.array([1.0, 0, 0]))
    parent = Transform(position=np.array([0.0, 2, 0]))
    c = local.combine(parent)
    np.testing.assert_allclose(c.position, [1, 2, 0], atol=1e-12)


def test_combine_scale_rotation():
    local = Transform(position=np.array([1.0, 0.0, 0.0]))
    parent = Transform.identity()
    parent.euler_angles = [0, 90, 0]
    c = local.combine(parent)
    # Row-vector convention: position rotates by parent rotation.
    np.testing.assert_allclose(c.position, [0, 0, -1], atol=1e-9)


def test_matrix_decompose_roundtrip():
    t = Transform(position=np.array([1.0, 2.0, 3.0]), scale=np.array([2.0, 1.0, 0.5]))
    t.euler_angles = [15, 30, 45]
    m = t.matrix()
    t2 = Transform.from_matrix(m)
    np.testing.assert_allclose(t2.position, t.position, atol=1e-9)
    np.testing.assert_allclose(t2.scale, t.scale, atol=1e-9)
    np.testing.assert_allclose(np.abs(np.dot(t2.rotation, t.rotation)), 1.0, atol=1e-9)
