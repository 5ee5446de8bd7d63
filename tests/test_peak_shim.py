"""Pin the skimage peak_local_max shim against an independent oracle.

The reference-parity tests execute the read-only reference with a
re-implemented ``skimage.feature.peak_local_max`` (the image lacks skimage;
the reference's single call is mad/Detector.py:29). To keep that comparison
non-circular, the shim's semantics are themselves tested here against a
brute-force per-voxel oracle (tests/ref_shims.py), deliberately covering
the edge cases a faithful re-implementation could get wrong:

  * plateau peaks (equal-valued neighbors all qualify under ==max);
  * exact threshold ties (strictly-greater floor);
  * peaks hugging the exclude_border line (inclusive/exclusive off-by-one);
  * grid-edge maxima where the constant-mode filter pads with 0;
  * descending-intensity output ordering with value ties.
"""

import numpy as np

from ref_shims import peak_local_max, peak_local_max_oracle


def _assert_same(grid, eb, thr):
    a = peak_local_max(grid, exclude_border=eb, threshold_abs=thr)
    b = peak_local_max_oracle(grid, exclude_border=eb, threshold_abs=thr)
    assert a.shape == b.shape, (a.shape, b.shape)
    # identical coordinate SETS and identical value ordering
    assert set(map(tuple, a)) == set(map(tuple, b))
    va = grid[tuple(a.T)] if len(a) else np.zeros(0)
    vb = grid[tuple(b.T)] if len(b) else np.zeros(0)
    np.testing.assert_array_equal(va, vb)
    # descending
    if len(va) > 1:
        assert np.all(np.diff(va) <= 0)


def test_random_grids_match_oracle():
    rng = np.random.default_rng(0)
    for trial in range(8):
        grid = rng.random((14, 12, 13)).astype(np.float32)
        # carve flat plateaus (equal-valued blocks straddling the border
        # line) and exact-threshold voxels
        grid[3:5, 4:6, 5] = 0.9
        grid[1, 1, 1] = 0.95          # inside only when eb <= 1
        grid[7, 7, 7] = 0.05          # exactly at the default threshold
        for eb in (0, 1, 2, 4):
            _assert_same(grid, eb, 0.05)


def test_quantized_ties_and_plateaus():
    rng = np.random.default_rng(1)
    # coarse quantization forces many exact ties / wide plateaus
    grid = (rng.integers(0, 5, (16, 15, 14)) / 4.0).astype(np.float32)
    for eb in (0, 1, 3):
        _assert_same(grid, eb, 0.2)


def test_edge_maxima_use_constant_padding():
    # a bright voxel ON the face: with eb=0 the constant-mode filter pads
    # out-of-bounds with 0, so the face voxel IS a peak
    grid = np.zeros((9, 9, 9), dtype=np.float32)
    grid[0, 4, 4] = 1.0
    out = peak_local_max(grid, exclude_border=0, threshold_abs=0.05)
    assert (0, 4, 4) in set(map(tuple, out))
    _assert_same(grid, 0, 0.05)
    # and with the reference's eb=12 > shape the result is empty
    out = peak_local_max(grid, exclude_border=12, threshold_abs=0.05)
    assert len(out) == 0


def test_reference_call_signature_on_realistic_field():
    # the exact call the reference makes (Detector.py:29) on a smooth
    # multi-blob field large enough for the 12-voxel border
    rng = np.random.default_rng(2)
    grid = np.zeros((40, 38, 36), dtype=np.float32)
    xs = np.stack(np.meshgrid(*[np.arange(s) for s in grid.shape],
                              indexing="ij"), -1).astype(np.float32)
    for _ in range(12):
        c = rng.uniform(8, 28, 3)
        amp = rng.uniform(0.2, 1.0)
        grid += amp * np.exp(-((xs - c) ** 2).sum(-1) / 18.0)
    _assert_same(grid, 12, 5e-2)
    out = peak_local_max(grid, exclude_border=12, threshold_abs=5e-2)
    assert len(out) >= 2
