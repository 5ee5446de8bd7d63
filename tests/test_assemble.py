import numpy as np
import pytest

from mad_tpu.core.config import AssemblyConfig
from mad_tpu.engine import assemble as asm
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly


@pytest.fixture(scope="module")
def solutions():
    # 4 non-overlapping placements + 1 duplicate of placement 0
    sub, copies = make_assembly(n_copies=4, n_res=30, seed=5, spread=30.0)
    dup = copies[0].with_coords(copies[0].coords + 1.0)
    return copies + [dup]


@pytest.fixture(scope="module")
def overlap(solutions):
    cfg = AssemblyConfig()
    grids = asm.solution_grids(solutions, cfg)
    return asm._overlap_matrix(grids, cfg)


def test_overlap_matrix_structure(solutions, overlap):
    n = len(solutions)
    assert overlap.shape == (n, n)
    assert np.all(np.tril(overlap) == 0)        # upper-triangular fill
    # duplicate overlaps its source heavily, distinct copies do not
    assert overlap[0, 4] > 0.5
    assert overlap[0, 1] < 0.1


def test_homomultimer_enumeration(solutions, overlap):
    tuples, sums, stds, maxs = asm.enumerate_homomultimer(5, 4, overlap)
    assert tuples.shape == (5, 4)
    # Best candidate (sorted by max overlap) is the clash-free quartet 0-3
    np.testing.assert_array_equal(tuples[0], [0, 1, 2, 3])
    assert maxs[0] < 0.1
    # Any tuple containing both 0 and its duplicate 4 ranks worse
    bad = [i for i, t in enumerate(tuples) if 0 in t and 4 in t]
    assert min(bad) > 0


def test_heteromer_enumeration(solutions, overlap):
    groups = {"A": [0, 4], "B": [1], "C": [2]}
    tuples, sums, stds, maxs = asm.enumerate_heteromer(groups, overlap)
    assert tuples.shape == (2, 3)
    # Picking solution 0 for A beats picking its clone 4 only via overlap sum
    assert set(tuples[0]) == {0, 1, 2} or set(tuples[0]) == {4, 1, 2}
    assert np.all(np.diff(sums) >= -1e-12)


def test_score_models(solutions, overlap):
    cfg = AssemblyConfig()
    coords = np.concatenate([s.coords for s in solutions[:4]])
    masses = np.concatenate([s.masses for s in solutions[:4]])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses)
    tuples, sums, stds, maxs = asm.enumerate_homomultimer(5, 4, overlap)
    models = asm.score_models(tuples, sums, stds, maxs, solutions, dmap, cfg,
                              max_models=3, max_overlap=0.1)
    assert models
    assert models[0].components == [0, 1, 2, 3]
    # Models are CC-scored at 4 A against the (8 A) map by design
    # (mad/MaD.py:737), so the correct assembly scores high but not ~1.
    assert models[0].ccc > 0.8


def test_heteromer_device_head_matches_bruteforce():
    """Large-product heteromer path (device top-k head) returns the same
    leading ranking as the exhaustive host enumeration."""
    rng = np.random.default_rng(11)
    n_sol = 4 * 8
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.2, k=1)
    groups = {f"s{g}": list(range(g * 8, (g + 1) * 8)) for g in range(4)}
    # force the device path by shrinking its trigger, exhaustive reference
    t_dev, s_dev, sd_dev, mx_dev = asm.enumerate_heteromer(
        groups, ov, head=64)
    assert len(t_dev) == 64 < 8 ** 4
    t_full = np.array(
        [[groups[f"s{g}"][i] for g, i in enumerate(tup)]
         for tup in __import__("itertools").product(*[range(8)] * 4)])
    s_full, sd_full, mx_full = asm._hetero_scores(t_full, ov)
    order = np.argsort(s_full, kind="stable")
    np.testing.assert_array_equal(t_dev, t_full[order][:64])
    np.testing.assert_allclose(s_dev, s_full[order][:64], atol=1e-5)
    np.testing.assert_allclose(mx_dev, mx_full[order][:64], atol=1e-6)


def test_heteromer_scales_without_host_product():
    """~1M-tuple cartesian product enumerates via the device head without
    materializing tuples on host (VERDICT round-1 item 6)."""
    import time
    rng = np.random.default_rng(12)
    n_per, n_groups = 16, 5                     # 16^5 = 1,048,576 tuples
    n_sol = n_per * n_groups
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.2, k=1)
    groups = {f"s{g}": list(range(g * n_per, (g + 1) * n_per))
              for g in range(n_groups)}
    t0 = time.time()
    tuples, sums, stds, maxs = asm.enumerate_heteromer(groups, ov)
    dt = time.time() - t0
    assert len(tuples) == 256                   # head only
    assert tuples.shape[1] == n_groups
    # ascending by sum, and each row has one solution per group
    assert np.all(np.diff(sums) >= -1e-9)
    for g in range(n_groups):
        assert np.all((tuples[:, g] >= g * n_per)
                      & (tuples[:, g] < (g + 1) * n_per))
    assert dt < 60, dt


def test_solution_overlap_matches_host_path(solutions):
    """The fused device overlap matrix (bit-packed common frame + popcount)
    equals the host path (per-grid pull + per-pair origin arithmetic)
    exactly: batched_simulate origins are lattice-registered, so the common
    frame reproduces overlap_boxes' per-pair rounding."""
    cfg = AssemblyConfig()
    grids = asm.solution_grids(solutions, cfg)
    host = asm._overlap_matrix(grids, cfg)
    dev = asm.solution_overlap(solutions, cfg)
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_solution_overlap_hetero_sizes(solutions):
    """Different atom counts share one padded program; parity holds against
    the per-structure host path."""
    from mad_tpu.core.structure import Structure
    cfg = AssemblyConfig()
    s = solutions[3]
    small = Structure(coords=s.coords[:100], masses=s.masses[:100],
                      ca_idx=np.arange(0), bb_idx=np.arange(0))
    mixed = solutions[:3] + [small]
    host = asm._overlap_matrix(asm.solution_grids(mixed, cfg), cfg)
    dev = asm.solution_overlap(mixed, cfg)
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_homomultimer_device_head_matches_bruteforce():
    """The shape-generic unranking head program returns the same leading
    ranking as exhaustive host enumeration (C(14,6) = 3003 tuples forced
    down the device path via head=32: 3003 > 4*32)."""
    rng = np.random.default_rng(7)
    n_sol, k = 14, 6
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.3, k=1)
    t_dev, s_dev, sd_dev, mx_dev = asm.enumerate_homomultimer(
        n_sol, k, ov, head=32)
    assert len(t_dev) == 32
    t_full = asm._all_combinations(n_sol, k)
    s_f, sd_f, mx_f = asm._score_tuples(t_full, ov)
    order = np.argsort(mx_f, kind="stable")
    np.testing.assert_array_equal(t_dev, t_full[order][:32])
    np.testing.assert_allclose(mx_dev, mx_f[order][:32], atol=1e-6)
    np.testing.assert_allclose(s_dev, s_f[order][:32], atol=1e-6)


@pytest.mark.slow
def test_enumeration_trim_is_announced(capsys):
    """Above 5M combinations the restriction to the top-N solutions prints
    and is recorded for CSV metadata (no silent coverage caps; the
    reference enumerates everything, mad/MaD.py:686-694)."""
    import math
    rng = np.random.default_rng(9)
    n_sol, k = 40, 10                  # C(40, 10) = 847,660,528 > 5M cap
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.3, k=1)
    asm.pop_enum_notes()
    tuples, _s, _sd, _mx = asm.enumerate_homomultimer(n_sol, k, ov)
    out = capsys.readouterr().out
    assert "MaD> enumeration restricted to the top" in out
    notes = asm.pop_enum_notes()
    assert any("restricted to the top" in n for n in notes)
    # the trim kept C(n, k) under the cap
    n_kept = int(notes[0].split("restricted to the top ")[1].split()[0])
    assert math.comb(n_kept, k) <= 5_000_000 < math.comb(n_kept + 1, k)


def test_heteromer_trim_is_announced(capsys):
    """Cartesian products above the cap trim the largest groups and say
    so (mad/MaD.py:799-805 enumerates all)."""
    rng = np.random.default_rng(13)
    n_sol = 36
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.2, k=1)
    groups = {f"s{g}": list(range(g * 12, (g + 1) * 12)) for g in range(3)}
    asm.pop_enum_notes()
    tuples, _s, _sd, _mx = asm.enumerate_heteromer(
        groups, ov, max_combinations=1000)      # 12^3 = 1728 > 1000
    out = capsys.readouterr().out
    assert "MaD> enumeration restricted to the best-ranked" in out
    assert asm.pop_enum_notes()


def test_above_frame_cap_enumerates_all():
    """Solution counts above the 64-slot device frame fall back to
    exhaustive host enumeration instead of silently truncating to the 64
    best-ranked solutions (ADVICE r2 medium)."""
    import math
    rng = np.random.default_rng(10)
    n_sol, k = 70, 2
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.3, k=1)
    asm.pop_enum_notes()
    tuples, _s, _sd, mx = asm.enumerate_homomultimer(n_sol, k, ov)
    assert len(tuples) == math.comb(n_sol, k)
    assert tuples.max() == n_sol - 1            # no solution dropped
    t_full = asm._all_combinations(n_sol, k)
    _sf, _sdf, mx_f = asm._score_tuples(t_full, ov)
    order = np.argsort(mx_f, kind="stable")
    np.testing.assert_array_equal(tuples, t_full[order])
    assert not asm.pop_enum_notes()             # nothing was restricted


def test_homomultimer_device_head_multi_chunk():
    """Rank space larger than one 16k chunk: running top-head merge across
    chunks still matches exhaustive enumeration (C(25,6) = 177,100)."""
    rng = np.random.default_rng(8)
    n_sol, k = 25, 6
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.3, k=1)
    t_dev, _s, _sd, mx_dev = asm.enumerate_homomultimer(n_sol, k, ov,
                                                        head=16)
    t_full = asm._all_combinations(n_sol, k)
    _sf, _sdf, mx_f = asm._score_tuples(t_full, ov)
    order = np.argsort(mx_f, kind="stable")
    np.testing.assert_array_equal(t_dev, t_full[order][:16])
    np.testing.assert_allclose(mx_dev, mx_f[order][:16], atol=1e-6)


def _defer_wrap(ov, m_pad):
    """Wrap a host triu overlap matrix as the device DeferredOverlap that
    solution_overlap(defer=True) would return (padded frame)."""
    import jax.numpy as jnp
    n = ov.shape[0]
    padded = np.zeros((m_pad, m_pad), np.float32)
    padded[:n, :n] = ov
    return asm.DeferredOverlap(dev=jnp.asarray(padded), n=n)


def test_solution_overlap_deferred(solutions):
    cfg = AssemblyConfig()
    host = asm.solution_overlap(solutions, cfg)
    deferred = asm.solution_overlap(solutions, cfg, defer=True)
    assert isinstance(deferred, asm.DeferredOverlap)
    np.testing.assert_allclose(deferred.host(), host, atol=1e-7)


def test_homomultimer_deferred_matches_host():
    """A DeferredOverlap chains into the device unranking head (no
    intermediate pull) and returns the same ranking as the host-matrix
    path — including through the trim logic."""
    rng = np.random.default_rng(7)
    n_sol, k = 14, 6
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.3, k=1)
    t_h, s_h, sd_h, mx_h = asm.enumerate_homomultimer(n_sol, k, ov, head=32)
    t_d, s_d, sd_d, mx_d = asm.enumerate_homomultimer(
        n_sol, k, _defer_wrap(ov, 16), head=32)
    np.testing.assert_array_equal(t_d, t_h)
    np.testing.assert_allclose(s_d, s_h, atol=1e-6)
    np.testing.assert_allclose(mx_d, mx_h, atol=1e-6)
    # host-path fallback (small combination count) pulls and matches too
    t_h2, s_h2, _sd, mx_h2 = asm.enumerate_homomultimer(6, 4, ov[:6, :6])
    t_d2, s_d2, _sd, mx_d2 = asm.enumerate_homomultimer(
        6, 4, _defer_wrap(ov[:6, :6], 8))
    np.testing.assert_array_equal(t_d2, t_h2)
    np.testing.assert_allclose(mx_d2, mx_h2, atol=1e-6)


def test_heteromer_deferred_matches_host():
    rng = np.random.default_rng(11)
    n_sol = 4 * 8
    ov = np.triu(rng.random((n_sol, n_sol)) * 0.2, k=1)
    groups = {f"s{g}": list(range(g * 8, (g + 1) * 8)) for g in range(4)}
    t_h, s_h, sd_h, mx_h = asm.enumerate_heteromer(groups, ov, head=64)
    t_d, s_d, sd_d, mx_d = asm.enumerate_heteromer(
        groups, _defer_wrap(ov, 40), head=64)
    np.testing.assert_array_equal(t_d, t_h)
    np.testing.assert_allclose(s_d, s_h, atol=1e-5)
    np.testing.assert_allclose(mx_d, mx_h, atol=1e-6)
