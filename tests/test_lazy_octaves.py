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


@pytest.mark.slow
def test_dense_octave_overflows_speculative_compaction():
    """A noise grid yields far more than 512 anchors per octave, forcing
    the speculative 512-anchor orientation to re-run at the true bucket
    (engine/pipeline.describe_grid). The full anchor set must survive."""
    import dataclasses
    import numpy as np
    from mad_tpu.core.config import MadConfig
    from mad_tpu.core.grid import DensityGrid
    from mad_tpu.engine.pipeline import describe_grid

    rng = np.random.default_rng(0)
    data = rng.random((96, 96, 96)).astype(np.float32)
    cfg = MadConfig()
    cfg = cfg.replace(
        scalespace=dataclasses.replace(cfg.scalespace, oct_mode="base"),
        detect=dataclasses.replace(cfg.detect, threshold_abs=1e-4))
    g = DensityGrid(data=data, origin=np.zeros(3), voxsp=2.0, name="noise")
    ds = describe_grid(g, cfg)
    # Dense noise: anchor count well beyond the speculative bucket.
    assert len(np.unique(ds.anchor_id)) > 512
    # Deterministic under the redo path.
    ds2 = describe_grid(g, cfg)
    np.testing.assert_array_equal(ds.anchor_id, ds2.anchor_id)
    np.testing.assert_array_equal(ds.desc_norm, ds2.desc_norm)
