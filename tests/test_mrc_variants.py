"""MRC header-zoo robustness (SURVEY.md section 7 'hard parts' #6):
axis-order permutations (mapc/mapr/maps) and nxstart-vs-origin conventions.
The reference crashes on nxstart maps via the voxsp/voxelsp typo
(mad/MapSpace.py:106); mad_tpu handles both conventions."""

import struct

import numpy as np
import pytest

from mad_tpu.core.grid import read_map


def _write_mrc_variant(path, arr_xyz, voxsp, origin, axis_order,
                       use_nxstart=False):
    """Write an MRC whose stored axes follow ``axis_order`` (the value of
    [mapc-1, mapr-1, maps-1]); the canonical reader must recover arr_xyz."""
    # reader: data_xyz = transpose(raw(ns,nr,nc), axis_order[::-1])
    # so raw = transpose(arr, argsort? ) — solve numerically
    perm = list(axis_order)[::-1]
    inv = np.argsort(perm)
    raw = np.transpose(arr_xyz, inv)            # (ns, nr, nc)
    ns, nr, nc = raw.shape
    hdr = bytearray(1024)
    if use_nxstart:
        starts = [int(round(origin[a] / voxsp)) for a in axis_order]
        ox = oy = oz = 0.0
    else:
        starts = [0, 0, 0]
        # reader reads origin_read[i] = words[axis_order[i]]
        words = [0.0, 0.0, 0.0]
        for i in range(3):
            words[axis_order[i]] = origin[i]
        ox, oy, oz = words
    struct.pack_into("<10i", hdr, 0, nc, nr, ns, 2,
                     starts[0], starts[1], starts[2], nc, nr, ns)
    struct.pack_into("<3f", hdr, 40, nc * voxsp, nr * voxsp, ns * voxsp)
    struct.pack_into("<3f", hdr, 52, 90.0, 90.0, 90.0)
    struct.pack_into("<3i", hdr, 64, axis_order[0] + 1, axis_order[1] + 1,
                     axis_order[2] + 1)
    struct.pack_into("<3f", hdr, 196, ox, oy, oz)
    hdr[208:212] = b"MAP "
    hdr[212:216] = bytes([0x44, 0x44, 0, 0])
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        raw.astype(np.float32).tofile(fh)


@pytest.mark.parametrize("axis_order", [(0, 1, 2), (2, 0, 1), (1, 2, 0),
                                        (2, 1, 0)])
def test_axis_order_permutations(tmp_path, axis_order):
    rng = np.random.default_rng(0)
    arr = rng.random((6, 5, 4)).astype(np.float32)
    path = str(tmp_path / "v.mrc")
    _write_mrc_variant(path, arr, 2.0, np.zeros(3), list(axis_order))
    g = read_map(path, normalize=False)
    np.testing.assert_allclose(g.data, arr, atol=1e-6)
    assert g.voxsp == pytest.approx(2.0)


def test_nxstart_origin_convention(tmp_path):
    # EMDB-style: origin encoded as voxel start offsets (mad/Dmap.py:33-35)
    rng = np.random.default_rng(1)
    arr = rng.random((4, 6, 5)).astype(np.float32)
    origin = np.array([8.0, -4.0, 12.0])
    path = str(tmp_path / "n.mrc")
    _write_mrc_variant(path, arr, 2.0, origin, [0, 1, 2], use_nxstart=True)
    g = read_map(path, normalize=False)
    np.testing.assert_allclose(g.data, arr, atol=1e-6)
    np.testing.assert_allclose(g.origin, origin)


def test_origin_record_convention(tmp_path):
    # Chimera-style: origin in the origin header words (mad/Dmap.py:36-39)
    rng = np.random.default_rng(2)
    arr = rng.random((5, 4, 6)).astype(np.float32)
    origin = np.array([3.5, 7.0, -2.5])
    path = str(tmp_path / "o.mrc")
    _write_mrc_variant(path, arr, 1.5, origin, [0, 1, 2])
    g = read_map(path, normalize=False)
    np.testing.assert_allclose(g.origin, origin, atol=1e-5)


def _write_mrc_bigendian(path, arr_xyz, voxsp, origin, stamp=True):
    """Big-endian mode-2 map (old EMDB depositions; machine stamp 0x11)."""
    raw = np.transpose(arr_xyz, (2, 1, 0))          # (nz, ny, nx)
    nz, ny, nx = raw.shape
    hdr = bytearray(1024)
    struct.pack_into(">10i", hdr, 0, nx, ny, nz, 2, 0, 0, 0, nx, ny, nz)
    struct.pack_into(">3f", hdr, 40, nx * voxsp, ny * voxsp, nz * voxsp)
    struct.pack_into(">3f", hdr, 52, 90.0, 90.0, 90.0)
    struct.pack_into(">3i", hdr, 64, 1, 2, 3)
    struct.pack_into(">3f", hdr, 196, *[float(o) for o in origin])
    hdr[208:212] = b"MAP "
    if stamp:
        hdr[212:216] = bytes([0x11, 0x11, 0, 0])
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        raw.astype(">f4").tofile(fh)


@pytest.mark.parametrize("stamp", [True, False])
def test_big_endian_map(tmp_path, stamp):
    """Byte order from the machine stamp, or (stamp blank, another EMDB
    reality) from the sane-dimensions heuristic."""
    rng = np.random.default_rng(0)
    arr = rng.random((7, 6, 5)).astype(np.float32)
    path = str(tmp_path / "be.mrc")
    _write_mrc_bigendian(path, arr, 1.5, (3.0, -4.5, 6.0), stamp=stamp)
    g = read_map(path, normalize=False)
    np.testing.assert_allclose(np.asarray(g.host()), arr, atol=1e-6)
    np.testing.assert_allclose(g.origin, [3.0, -4.5, 6.0], atol=1e-5)
    assert np.isclose(g.voxsp, 1.5)


def test_integer_mode_map(tmp_path):
    """Mode-1 (int16) volumes read and normalize like mode-2."""
    arr = (np.arange(5 * 4 * 3).reshape(5, 4, 3) % 100).astype(np.int16)
    raw = np.transpose(arr, (2, 1, 0))
    nz, ny, nx = raw.shape
    hdr = bytearray(1024)
    struct.pack_into("<10i", hdr, 0, nx, ny, nz, 1, 0, 0, 0, nx, ny, nz)
    struct.pack_into("<3f", hdr, 40, nx * 2.0, ny * 2.0, nz * 2.0)
    struct.pack_into("<3i", hdr, 64, 1, 2, 3)
    hdr[208:212] = b"MAP "
    hdr[212:216] = bytes([0x44, 0x44, 0, 0])
    path = str(tmp_path / "i16.mrc")
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        raw.tofile(fh)
    g = read_map(path, normalize=False)
    np.testing.assert_allclose(np.asarray(g.host()), arr.astype(np.float32))
