import numpy as np
import pytest

from ogl_beamforming_tpu.utils.transforms import (apply_m4,
                                                  das_output_dimension,
                                                  das_transform,
                                                  das_transform_2d_xz,
                                                  das_transform_3d,
                                                  voxel_world_points)


def test_output_dimension_collapse():
    np.testing.assert_array_equal(das_output_dimension([1, 1, 64]), [64, 1, 1])
    np.testing.assert_array_equal(das_output_dimension([0, 5, 0]), [5, 1, 1])
    np.testing.assert_array_equal(das_output_dimension([32, 1, 64]), [32, 64, 1])
    np.testing.assert_array_equal(das_output_dimension([1, 32, 64]), [64, 32, 1])
    np.testing.assert_array_equal(das_output_dimension([8, 8, 8]), [8, 8, 8])


def test_transform_2d_xz_corners():
    m = das_transform_2d_xz([-0.02, 0.01], [0.02, 0.05])
    np.testing.assert_allclose(apply_m4(m, np.array([0, 0, 0], np.float32)),
                               [-0.02, 0, 0.01], atol=1e-7)
    np.testing.assert_allclose(apply_m4(m, np.array([1, 1, 0], np.float32)),
                               [0.02, 0, 0.05], atol=1e-7)


def test_transform_3d_corners():
    m = das_transform_3d([-1, -2, 3], [1, 2, 5])
    np.testing.assert_allclose(apply_m4(m, np.zeros(3, np.float32)),
                               [-1, -2, 3], atol=1e-6)
    np.testing.assert_allclose(apply_m4(m, np.ones(3, np.float32)),
                               [1, 2, 5], atol=1e-6)


def test_das_transform_dispatch():
    m, p = das_transform([-0.01, 0, 0.01], [0.01, 0, 0.04], [128, 1, 256])
    np.testing.assert_array_equal(p, [128, 256, 1])
    w = voxel_world_points(m, p)
    assert w.shape == (128, 256, 1, 3)
    np.testing.assert_allclose(w[0, 0, 0], [-0.01, 0, 0.01], atol=1e-7)
    np.testing.assert_allclose(w[-1, -1, 0], [0.01, 0, 0.04], atol=1e-7)
    # y collapsed: all world y == 0
    assert np.abs(w[..., 1]).max() == pytest.approx(0.0, abs=1e-7)


def test_voxel_world_points_single_voxel_axis():
    m = das_transform_3d([0, 0, 0], [1, 1, 1])
    w = voxel_world_points(m, [4, 1, 4])
    assert w.shape == (4, 1, 4, 3)
    np.testing.assert_allclose(w[:, 0, 0, 0], [0, 1 / 3, 2 / 3, 1], atol=1e-6)


def test_plane_helpers():
    from ogl_beamforming_tpu.utils.transforms import (
        plane_corners_from_transform, plane_normal_from_transform,
        plane_offset_from_transform, plane_uv)
    m = das_transform_2d_xz([-0.01, 0.01], [0.01, 0.05])
    n = plane_normal_from_transform(m)
    # xz plane: normal along -y or +y
    assert abs(abs(n[1]) - 1.0) < 1e-6
    assert plane_offset_from_transform(m) == pytest.approx(0.0, abs=1e-7)
    lo, hi = plane_corners_from_transform(m)
    assert lo[0] == pytest.approx(-0.01, abs=1e-6)
    uv = plane_uv([0.5, 0, 0], [1, 0, 0], [0, 0, 1])
    np.testing.assert_allclose(uv, [0.5, 0.0], atol=1e-7)


def test_obb_raycast():
    from ogl_beamforming_tpu.utils.transforms import obb_raycast
    m = np.eye(4, dtype=np.float32)
    # unit cube at origin, ray from -z
    d = obb_raycast(m, [0.5, 0.5, 0.5], [0, 0, 0], [0, 0, -5], [0, 0, 1])
    assert d == pytest.approx(4.5, abs=1e-5)
    # miss
    assert obb_raycast(m, [0.5, 0.5, 0.5], [0, 0, 0], [3, 0, -5],
                       [0, 0, 1]) == -1.0
    # ray parallel to a slab, inside it
    d = obb_raycast(m, [0.5, 0.5, 0.5], [0, 0, 0], [-5, 0.2, 0], [1, 0, 0])
    assert d == pytest.approx(4.5, abs=1e-5)
