import numpy as np
import pytest

from mad_tpu.core.config import MatchConfig
from mad_tpu.engine.match import match_descriptors
from mad_tpu.engine.pipeline import DescriptorSet


def _make_set(desc, coords, rfinal=None, name="s"):
    n = desc.shape[0]
    if rfinal is None:
        rfinal = np.broadcast_to(np.eye(3, dtype=np.float32),
                                 (n, 3, 3)).copy()
    norm = desc.astype(np.float32)
    lens = np.linalg.norm(norm, axis=1, keepdims=True)
    norm = np.where(lens > 0, norm / np.where(lens > 0, lens, 1), norm)
    return DescriptorSet(
        desc=desc.astype(np.int16), desc_norm=norm,
        coords=coords.astype(np.float32), map_coords=coords.astype(float),
        subv_coords=coords.astype(float), rfinal=rfinal.astype(np.float32),
        octave=np.zeros(n, np.int32), anchor_id=np.arange(n, dtype=np.int32),
        main_bin=np.zeros(n, np.int32), sec_bin=np.zeros(n, np.int32),
        name=name)


@pytest.fixture(scope="module")
def identical_sets():
    rng = np.random.default_rng(0)
    n = 24
    desc = rng.integers(0, 50, size=(n, 1024))
    coords = rng.normal(size=(n, 3)) * 20 + 40
    return _make_set(desc, coords, name="map"), \
        _make_set(desc, coords, name="sub")


def test_self_match_perfect_repeatability(identical_sets):
    map_set, sub_set = identical_sets
    cfg = MatchConfig(cc_threshold=0.95, max_pairs=512, exact_top=64)
    table = match_descriptors(map_set, sub_set, (64, 64, 64), (0.0, 0.0, 0.0),
                              2.0, cfg)
    assert table.n >= 24          # at least the diagonal matches
    # Diagonal pairs (identity pose) must reach repeatability 100
    diag = table.hi_idx == table.lo_idx
    assert diag.any()
    assert table.repeat[np.nonzero(diag)[0][0]] == pytest.approx(100.0)
    # Table is repeat-sorted
    assert np.all(np.diff(table.repeat) <= 1e-9)
    # cc of diagonal pairs ~ 1
    assert table.cc[np.nonzero(diag)[0][0]] > 0.999


def test_threshold_filters_pairs(identical_sets):
    map_set, sub_set = identical_sets
    cfg = MatchConfig(cc_threshold=1.01, max_pairs=256, exact_top=0)
    table = match_descriptors(map_set, sub_set, (64, 64, 64), (0.0, 0.0, 0.0),
                              2.0, cfg)
    assert table.n == 0


def _exact_repeat_np(table, i, anchor_dist):
    """Independent brute-force NN repeatability for returned pair i."""
    pts = (table.hi_cloud - table.hi_coord[i]) @ table.rot[i].T \
        + table.lo_coord[i]
    d2 = ((pts[:, None, :] - table.lo_cloud[None, :, :]) ** 2).sum(-1)
    hits = np.sqrt(d2.min(axis=1)) < anchor_dist
    return 100.0 * np.count_nonzero(hits) / table.hi_cloud.shape[0]


def _random_rot(rng, n):
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return q.astype(np.float32)


def test_min_exact_makes_consumed_ordering_exact():
    """Clustering consumes top n_samples*n_copies pairs by repeatability;
    with min_exact covering them, every consumed repeat is the exact NN
    score, not the voxel-dilated approximation (VERDICT round-1 item 4)."""
    rng = np.random.default_rng(7)
    n = 32
    desc = rng.integers(0, 50, size=(n, 1024))       # random vecs: cc ~ 0.75
    mcoords = rng.normal(size=(n, 3)) * 12 + 60
    scoords = rng.normal(size=(n, 3)) * 12 + 60
    map_set = _make_set(desc, mcoords, rfinal=_random_rot(rng, n), name="map")
    sub_set = _make_set(rng.integers(0, 50, size=(n, 1024)), scoords,
                        rfinal=_random_rot(rng, n), name="sub")
    cfg = MatchConfig(cc_threshold=0.6, max_pairs=4096, exact_top=64)
    args = (map_set, sub_set, (64, 64, 64), (0.0, 0.0, 0.0), 2.0, cfg)

    # Hole: with only the default exact_top re-scored, pairs beyond it keep
    # approximate scores that disagree with the exact NN computation.
    t_hole = match_descriptors(*args)
    assert t_hole.n > 256
    exact = np.array([_exact_repeat_np(t_hole, i, cfg.anchor_dist)
                      for i in range(t_hole.n)])
    assert np.any(np.abs(t_hole.repeat - exact) > 1e-6), \
        "seed produced no approx-vs-exact divergence; test is vacuous"

    # Fix: min_exact covering every pair makes all scores exact.
    t_fixed = match_descriptors(*args, min_exact=t_hole.n)
    exact_f = np.array([_exact_repeat_np(t_fixed, i, cfg.anchor_dist)
                        for i in range(t_fixed.n)])
    np.testing.assert_allclose(t_fixed.repeat, exact_f, atol=1e-4)
    # and the table is sorted by those exact scores
    assert np.all(np.diff(t_fixed.repeat) <= 1e-9)


def test_translated_cloud_repeatability():
    # Subunit = map translated by t; descriptors identical, coords shifted.
    rng = np.random.default_rng(1)
    n = 16
    desc = rng.integers(0, 50, size=(n, 1024))
    mcoords = rng.normal(size=(n, 3)) * 15 + 40
    t = np.array([30.0, 5.0, -8.0])
    map_set = _make_set(desc, mcoords, name="map")
    sub_set = _make_set(desc, mcoords + t, name="sub")
    cfg = MatchConfig(cc_threshold=0.95, max_pairs=256, exact_top=64)
    table = match_descriptors(map_set, sub_set, (64, 64, 64), (0.0, 0.0, 0.0),
                              2.0, cfg)
    diag = np.nonzero(table.hi_idx == table.lo_idx)[0]
    # identity rotation + matching anchor translation -> full overlap
    assert table.repeat[diag[0]] == pytest.approx(100.0)
