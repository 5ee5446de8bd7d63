import numpy as np
import pytest

from mad_tpu.core.config import ScaleSpaceConfig
from mad_tpu.core.grid import DensityGrid
from mad_tpu.ops.scalespace import build_scale_space


def _blob_grid(shape=(40, 36, 32), center=(20, 18, 16), sigma=3.0,
               voxsp=2.0):
    xs = [np.arange(s, dtype=np.float64) for s in shape]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    r2 = ((X - center[0]) ** 2 + (Y - center[1]) ** 2 + (Z - center[2]) ** 2)
    data = np.exp(-r2 / (2 * sigma ** 2)).astype(np.float32)
    return DensityGrid(data=data, origin=np.array([4.0, 6.0, 8.0]),
                       voxsp=voxsp)


def test_octave_geometry():
    g = _blob_grid()
    cfg = ScaleSpaceConfig(map_padding=9)
    ss = build_scale_space(g, cfg, shape_bucket=16)
    assert len(ss.octaves) == 2
    up, base = ss.octaves
    assert base.voxsp == pytest.approx(2.0)
    assert up.voxsp == pytest.approx(1.0)
    # padding shifts the origin by map_padding voxels
    np.testing.assert_allclose(ss.origin, g.origin - 9 * g.voxsp)
    # real shapes: padded dims, upsampled = 2n-1
    assert base.real_shape == (58, 54, 50)
    assert up.real_shape == (115, 107, 99)
    assert base.grad.shape[:3] == base.log.shape


def test_log_peaks_at_blob_center():
    g = _blob_grid()
    cfg = ScaleSpaceConfig(map_padding=9)
    ss = build_scale_space(g, cfg, shape_bucket=16)
    base = ss.octaves[1]
    log = np.asarray(base.log)
    idx = np.unravel_index(np.argmax(log), log.shape)
    # blob center moved by padding (9 voxels)
    np.testing.assert_allclose(idx, (29, 27, 25), atol=1)
    assert log.max() > 0.05
    # LoG is clamped at zero
    assert log.min() == 0.0


def test_base_only_mode():
    g = _blob_grid()
    cfg = ScaleSpaceConfig(oct_mode="base", map_padding=4)
    ss = build_scale_space(g, cfg, shape_bucket=8)
    assert len(ss.octaves) == 1
    assert ss.octaves[0].voxsp == pytest.approx(2.0)


def test_gradient_points_inward():
    # Gradient of a radial blob points toward the center (positive dot with
    # center-directed vector)
    g = _blob_grid()
    ss = build_scale_space(g, ScaleSpaceConfig(map_padding=9),
                           shape_bucket=16)
    base = ss.octaves[1]
    grad = np.asarray(base.grad)
    c = np.array([29, 27, 25])
    p = np.array([35, 27, 25])
    d = grad[tuple(p)]
    to_center = c - p
    assert np.dot(d, to_center) > 0
