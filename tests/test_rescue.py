"""Rescue rounds: re-clustering unexplained-density pairs after the first
docking pass (new capability; the reference stops after one pass,
mad/MaD.py:371-411).
"""

import dataclasses

import numpy as np
import pytest

from mad_tpu.core.config import MadConfig, MatchConfig
from mad_tpu.engine.docking import dock_structure
from mad_tpu.engine.match import exact_rescore, match_descriptors
from mad_tpu.engine.pipeline import describe_grid
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly

from test_match import _exact_repeat_np, _make_set, _random_rot

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dimer():
    cfg = MadConfig()
    cfg = cfg.replace(detect=dataclasses.replace(cfg.detect,
                                                 max_anchors=1024))
    sub, copies = make_assembly(n_copies=2, n_res=40, seed=3, spread=14.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses,
                            shape_bucket=cfg.shape_bucket)
    sub_grid = simulate_density(sub, 8.0, 2.0, shape_bucket=cfg.shape_bucket)
    map_dsc = describe_grid(dmap, cfg, name="map")
    sub_dsc = describe_grid(sub_grid, cfg, name="sub")
    return cfg, sub, copies, dmap, map_dsc, sub_dsc


def _found(sols, copies, tol=5.0):
    return sum(
        min((s.structure.rmsd_ca_with(c) for s in sols), default=np.inf)
        < tol for c in copies)


def test_rescue_recovers_unexplained_copy(dimer):
    """With a starved first-round budget only one copy clusters; the rescue
    round recovers the second from its unexplained density under the same
    weight/repeat gates."""
    cfg, sub, copies, dmap, map_dsc, sub_dsc = dimer
    starved = dataclasses.replace(cfg.filter, n_samples=4)

    c0 = cfg.replace(filter=dataclasses.replace(starved, rescue_rounds=0))
    s0 = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, c0, n_copies=2,
                        verbose=False)
    assert _found(s0, copies) == 1, "fixture drift: round 1 should miss one"

    c1 = cfg.replace(filter=dataclasses.replace(starved, rescue_rounds=1))
    s1 = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, c1, n_copies=2,
                        verbose=False)
    assert _found(s1, copies) == 2
    # rescue only ever adds solutions; the first round's are unchanged
    assert len(s1) >= len(s0)


def test_rescue_noop_when_everything_explained(dimer):
    """At the default budget both copies are found in round 1; the rescue
    round must not invent additional solutions from explained density."""
    cfg, sub, copies, dmap, map_dsc, sub_dsc = dimer
    base = dataclasses.replace(cfg.filter, n_samples=60)
    c0 = cfg.replace(filter=dataclasses.replace(base, rescue_rounds=0))
    c1 = cfg.replace(filter=dataclasses.replace(base, rescue_rounds=1))
    s0 = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, c0, n_copies=2,
                        verbose=False)
    s1 = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, c1, n_copies=2,
                        verbose=False)
    assert _found(s0, copies) == 2
    assert _found(s1, copies) == 2
    # all-good case: the rescue pass adds no spurious solutions
    assert len(s1) == len(s0)


def test_exact_rescore_matches_bruteforce():
    """exact_rescore on an arbitrary row subset equals the independent
    brute-force NN computation (same kernel the in-match exact prefix
    uses, arbitrary selection)."""
    rng = np.random.default_rng(11)
    n = 32
    map_set = _make_set(rng.integers(0, 50, size=(n, 1024)),
                        rng.normal(size=(n, 3)) * 12 + 60,
                        rfinal=_random_rot(rng, n), name="map")
    sub_set = _make_set(rng.integers(0, 50, size=(n, 1024)),
                        rng.normal(size=(n, 3)) * 12 + 60,
                        rfinal=_random_rot(rng, n), name="sub")
    cfg = MatchConfig(cc_threshold=0.6, max_pairs=1024, exact_top=0)
    table = match_descriptors(map_set, sub_set, (64, 64, 64),
                              (0.0, 0.0, 0.0), 2.0, cfg)
    assert table.n > 64
    rows = np.asarray([0, 3, 17, table.n - 1, 5, 50])
    got = exact_rescore(table, rows, cfg.anchor_dist)
    want = [_exact_repeat_np(table, int(i), cfg.anchor_dist) for i in rows]
    np.testing.assert_allclose(got, want, atol=1e-4)
    # and the subset view carries the re-scored repeats
    sub_t = table.take(rows, repeat=got)
    assert sub_t.n == len(rows)
    np.testing.assert_allclose(sub_t.cc, table.cc[rows])
