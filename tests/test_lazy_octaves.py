import numpy as np
import pytest

from mad_tpu.core.config import ScaleSpaceConfig
from mad_tpu.core.grid import DensityGrid
from mad_tpu.ops.scalespace import (build_scale_space, iter_lazy_octaves,
                                    LazyOctave)


@pytest.fixture(scope="module")
def grid():
    rng = np.random.default_rng(3)
    data = np.zeros((30, 28, 26), np.float32)
    data[8:22, 8:20, 8:18] = rng.random((14, 12, 10)).astype(np.float32)
    return DensityGrid(data=data, origin=np.array([1.0, 2.0, 3.0]),
                       voxsp=2.0)


def test_lazy_matches_eager(grid):
    cfg = ScaleSpaceConfig(map_padding=6)
    ss = build_scale_space(grid, cfg, shape_bucket=8)
    lazies = list(iter_lazy_octaves(grid, cfg, shape_bucket=8))
    assert len(lazies) == len(ss.octaves) == 2
    for (origin, lazy), octv in zip(lazies, ss.octaves):
        assert lazy.voxsp == octv.voxsp
        assert lazy.real_shape == octv.real_shape
        np.testing.assert_allclose(np.asarray(lazy.log()),
                                   np.asarray(octv.log), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lazy.grad()),
                                   np.asarray(octv.grad), atol=1e-6)
        np.testing.assert_allclose(origin, grid.origin - 6 * grid.voxsp)


def test_bf16_gradient_gate(grid, monkeypatch):
    cfg = ScaleSpaceConfig(map_padding=4, oct_mode="base")
    monkeypatch.setattr(LazyOctave, "BF16_VOXELS", 1)  # force the bf16 path
    (origin, lazy), = iter_lazy_octaves(grid, cfg, shape_bucket=8)
    g16 = np.asarray(lazy.grad(), dtype=np.float32)
    monkeypatch.setattr(LazyOctave, "BF16_VOXELS", 10 ** 12)
    (_, lazy32), = iter_lazy_octaves(grid, cfg, shape_bucket=8)
    g32 = np.asarray(lazy32.grad())
    assert np.abs(g16 - g32).max() < 2e-2 * max(np.abs(g32).max(), 1e-6)
    # directions agree closely where the gradient is significant
    n32 = np.linalg.norm(g32, axis=-1)
    sel = n32 > 0.05 * n32.max()
    cos = np.sum(g16[sel] * g32[sel], axis=-1) / (
        np.linalg.norm(g16[sel], axis=-1) * n32[sel] + 1e-12)
    assert cos.min() > 0.99
