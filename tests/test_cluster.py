import numpy as np

from mad_tpu.core.config import FilterConfig
from mad_tpu.engine.cluster import filter_pairs
from mad_tpu.engine.match import MatchTable


def _make_table(rots, hi_coords, lo_coords, repeats, cloud):
    n = len(rots)
    return MatchTable(
        cc=np.full(n, 0.9), repeat=np.asarray(repeats, float),
        hi_idx=np.arange(n), lo_idx=np.arange(n),
        rot=np.asarray(rots, float), hi_coord=np.asarray(hi_coords, float),
        lo_coord=np.asarray(lo_coords, float),
        hi_cloud=np.asarray(cloud, float),
        lo_cloud=np.asarray(cloud, float))


def test_clusters_nearby_poses_and_weights():
    rng = np.random.default_rng(0)
    cloud = rng.normal(size=(30, 3)) * 10
    eye = np.eye(3)
    # 5 identical poses + 3 far-shifted poses, repeat-ordered
    rots = [eye] * 8
    hi = [[0, 0, 0]] * 8
    lo = [[0, 0, 0]] * 5 + [[50, 0, 0]] * 3
    repeats = [80, 70, 60, 50, 40, 30, 20, 10]
    table = _make_table(rots, hi, lo, repeats, cloud)
    cfg = FilterConfig(weight_threshold=2, min_repeat=5, repeat_frac=0.3)
    cands = filter_pairs(table, np.zeros(8), np.zeros(8), cfg, n_samples=8)
    assert len(cands) == 2
    assert cands[0].weight == 5 and cands[1].weight == 3
    # Representative = founding (highest-repeat) member
    assert cands[0].repeat == 80 and cands[1].repeat == 30
    assert len(cands[0].members) == 5


def test_weight_threshold_drops_small_clusters():
    cloud = np.random.default_rng(1).normal(size=(20, 3)) * 10
    eye = np.eye(3)
    rots = [eye] * 4
    hi = [[0, 0, 0]] * 4
    lo = [[0, 0, 0], [0, 0, 0], [0, 0, 0], [60, 0, 0]]
    table = _make_table(rots, hi, lo, [50, 40, 30, 20], cloud)
    cfg = FilterConfig(weight_threshold=3)
    cands = filter_pairs(table, np.zeros(4), np.zeros(4), cfg, n_samples=4)
    assert len(cands) == 1 and cands[0].weight == 3


def test_repeat_threshold():
    cloud = np.random.default_rng(2).normal(size=(20, 3)) * 10
    eye = np.eye(3)
    # second cluster has repeat far below 0.3 * best
    rots = [eye] * 6
    hi = [[0, 0, 0]] * 6
    lo = [[0, 0, 0]] * 3 + [[60, 0, 0]] * 3
    table = _make_table(rots, hi, lo, [90, 85, 80, 10, 9, 8], cloud)
    cfg = FilterConfig(weight_threshold=2)
    cands = filter_pairs(table, np.zeros(6), np.zeros(6), cfg, n_samples=6)
    assert len(cands) == 1
    assert cands[0].repeat == 90


def test_closed_form_cloud_rmsd_matches_direct():
    # Two rotated/translated poses: closed-form RMSD must equal the direct
    # cloud RMSD that the reference computes (mad/MaD.py:509-510).
    rng = np.random.default_rng(3)
    cloud = rng.normal(size=(40, 3)) * 8
    from mad_tpu.core.geometry import axis_angle_mat
    import jax.numpy as jnp
    R1 = np.asarray(axis_angle_mat(jnp.array([0.0, 0, 1]), jnp.array(0.3)))
    R2 = np.asarray(axis_angle_mat(jnp.array([0.0, 1, 0]), jnp.array(0.25)))
    h1, l1 = np.array([1.0, 2, 3]), np.array([4.0, 5, 6])
    h2, l2 = np.array([0.0, 1, 0]), np.array([5.0, 5, 5])
    c1 = (cloud - h1) @ R1.T + l1
    c2 = (cloud - h2) @ R2.T + l2
    direct = np.sqrt(np.sum((c1 - c2) ** 2) / len(cloud))
    # closed form via the same moments filter_pairs uses
    mu = cloud.mean(axis=0)
    M = cloud.T @ cloud / len(cloud)
    A1, b1 = R1.T, l1 - h1 @ R1.T
    A2, b2 = R2.T, l2 - h2 @ R2.T
    D, d = A1 - A2, b1 - b2
    r2 = np.einsum("ij,ik,kj->", D, M, D) + 2 * mu @ D @ d + d @ d
    assert abs(np.sqrt(r2) - direct) < 1e-8
