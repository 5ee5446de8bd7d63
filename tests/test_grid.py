import numpy as np
import pytest

from mad_tpu.core.grid import (DensityGrid, ccc_grids, overlap_boxes,
                               overlap_fraction, read_map, write_mrc,
                               write_sit)


def _grid(data, origin=(0, 0, 0), voxsp=2.0):
    return DensityGrid(data=np.asarray(data, np.float32),
                       origin=np.asarray(origin, float), voxsp=voxsp)


def test_mrc_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    g = _grid(rng.random((6, 5, 4)), origin=(10.0, -4.0, 2.0), voxsp=1.5)
    path = str(tmp_path / "t.mrc")
    write_mrc(g, path)
    g2 = read_map(path, normalize=False)
    np.testing.assert_allclose(g2.data, g.data, atol=1e-6)
    np.testing.assert_allclose(g2.origin, g.origin, atol=1e-5)
    assert g2.voxsp == pytest.approx(1.5)


def test_sit_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    g = _grid(rng.random((4, 3, 5)), origin=(2.0, 4.0, 6.0), voxsp=2.0)
    path = str(tmp_path / "t.sit")
    write_sit(g, path)
    g2 = read_map(path, normalize=False)
    np.testing.assert_allclose(g2.data, g.data, atol=1e-5)
    np.testing.assert_allclose(g2.origin, g.origin)


def test_reduce_void():
    data = np.zeros((20, 20, 20), np.float32)
    data[8:12, 9:11, 5:15] = 1.0
    g = _grid(data).reduce_void(zeros_padding=3)
    assert g.shape == (4 + 6, 2 + 6, 10 + 6)
    np.testing.assert_allclose(g.origin, [(8 - 3) * 2.0, (9 - 3) * 2.0,
                                          (5 - 3) * 2.0])
    assert g.data.sum() == data.sum()


def test_ccc_identical_grids():
    rng = np.random.default_rng(2)
    d = rng.random((8, 8, 8)).astype(np.float32)
    assert ccc_grids(d, (0, 0, 0), d, (0, 0, 0), 1.0) == pytest.approx(1.0)


def test_ccc_shifted_overlap():
    d = np.zeros((10, 10, 10), np.float32)
    d[4:6, 4:6, 4:6] = 1.0
    # Same content shifted by exactly its own support: no overlap of mass
    c = ccc_grids(d, (0, 0, 0), d, (4.0, 0, 0), 2.0)
    assert c < 1.0
    c_same = ccc_grids(d, (0, 0, 0), d, (0.0, 0, 0), 2.0)
    assert c_same == pytest.approx(1.0)


def test_overlap_boxes_disjoint():
    assert overlap_boxes((0, 0, 0), (4, 4, 4), (100, 0, 0), (4, 4, 4),
                         1.0) is None


def test_overlap_fraction():
    a = np.zeros((10, 10, 10), np.float32)
    a[:5] = 1.0
    b = np.zeros((10, 10, 10), np.float32)
    b[:] = 1.0
    # half of b's region... overlap_fraction is relative to grid1
    f = overlap_fraction(a, (0, 0, 0), b, (0, 0, 0), 1.0)
    assert f == pytest.approx(1.0)
    f2 = overlap_fraction(b, (0, 0, 0), a, (0, 0, 0), 1.0)
    assert f2 == pytest.approx(0.5)
