"""Fused dock-select path (engine/dock_fused + docking._dock_structure_fused)
vs the split match->cluster->refine path: same solutions, same bookkeeping.
"""

import dataclasses

import numpy as np
import pytest

from mad_tpu.core.config import MadConfig
from mad_tpu.engine.docking import dock_structure
from mad_tpu.engine.pipeline import describe_grid
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trimer():
    cfg = MadConfig()
    cfg = cfg.replace(detect=dataclasses.replace(cfg.detect,
                                                 max_anchors=1024))
    sub, copies = make_assembly(n_copies=3, n_res=40, seed=3, spread=18.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses,
                            shape_bucket=cfg.shape_bucket)
    sub_grid = simulate_density(sub, 8.0, 2.0, shape_bucket=cfg.shape_bucket)
    map_dsc = describe_grid(dmap, cfg, name="fuse_map")
    sub_dsc = describe_grid(sub_grid, cfg, name="fuse_sub")
    return cfg, sub, copies, dmap, map_dsc, sub_dsc


def _dock_both(monkeypatch, cfg, sub, dmap, map_dsc, sub_dsc, n_copies):
    pre = {}

    def on_filtered(key):
        def cb(cands):
            pre[key] = cands
        return cb

    monkeypatch.setenv("MAD_TPU_FUSED_DOCK", "0")
    split = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                           n_copies=n_copies, verbose=False,
                           on_filtered=on_filtered("split"))
    monkeypatch.setenv("MAD_TPU_FUSED_DOCK", "1")
    fused = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                           n_copies=n_copies, verbose=False,
                           on_filtered=on_filtered("fused"))
    return split, fused, pre


def _assert_equal(split, fused, pre):
    # pre-refinement candidate sets (the on_filtered hook contract)
    assert len(pre["split"]) == len(pre["fused"])
    for a, b in zip(pre["split"], pre["fused"]):
        assert a.weight == b.weight
        assert a.repeat == pytest.approx(b.repeat, abs=1e-4)
        np.testing.assert_allclose(a.rot, b.rot, atol=1e-6)
        assert len(a.members) == len(b.members)
        for ma, mb in zip(a.members, b.members):
            np.testing.assert_allclose(ma, mb, atol=1e-9)
    # final solutions
    assert len(split) == len(fused)
    for a, b in zip(split, fused):
        assert a.weight == b.weight
        assert a.repeat == pytest.approx(b.repeat, abs=1e-4)
        assert a.ccc == pytest.approx(b.ccc, abs=1e-5)
        assert a.structure.rmsd_ca_with(b.structure) < 1e-3
        assert len(a.members) == len(b.members)


def test_fused_equals_split(monkeypatch, trimer):
    cfg, sub, copies, dmap, map_dsc, sub_dsc = trimer
    cfg = cfg.replace(filter=dataclasses.replace(cfg.filter,
                                                 rescue_rounds=1))
    split, fused, pre = _dock_both(monkeypatch, cfg, sub, dmap, map_dsc,
                                   sub_dsc, 3)
    assert len(fused) >= 3
    _assert_equal(split, fused, pre)


def test_fused_equals_split_with_rescue(monkeypatch, trimer):
    """A starved first-round budget forces the rescue round to do real work
    in both paths (tests the fused rescue-select program)."""
    cfg, sub, copies, dmap, map_dsc, sub_dsc = trimer
    cfg = cfg.replace(filter=dataclasses.replace(
        cfg.filter, n_samples=4, rescue_rounds=2))
    split, fused, pre = _dock_both(monkeypatch, cfg, sub, dmap, map_dsc,
                                   sub_dsc, 3)
    assert len(split) > len(pre["split"]), \
        "fixture drift: rescue should add solutions"
    _assert_equal(split, fused, pre)


def test_fused_candidate_frame_overflow(monkeypatch, trimer):
    """When the gated cluster count beats the speculative candidate frame,
    the fused path must fall back to refining every candidate (host path)
    and record a bigger frame for the next process."""
    from mad_tpu.engine import docking as dk

    cfg, sub, copies, dmap, map_dsc, sub_dsc = trimer
    cfg = cfg.replace(filter=dataclasses.replace(
        cfg.filter, weight_threshold=1, repeat_frac=0.0, min_repeat=0.0,
        rmsd_cloud=2.0, rescue_rounds=0))

    put = {}
    monkeypatch.setattr(dk, "_frames_adopt", lambda key, default: (16,))
    monkeypatch.setattr(dk, "_frames_put",
                        lambda key, caps: put.setdefault(key, caps))
    split, fused, pre = _dock_both(monkeypatch, cfg, sub, dmap, map_dsc,
                                   sub_dsc, 3)
    assert len(pre["fused"]) > 16, "fixture drift: want a frame overflow"
    _assert_equal(split, fused, pre)
    (key, caps), = put.items()
    assert caps[0] > 16


def test_dock_frame_pinned_for_process(monkeypatch, tmp_path):
    """A candidate-frame rung written at the end of one pass must NOT
    change the frame later passes adopt — a mid-process frame change means
    recompiling the dock-select + refinement chain on a warm pass."""
    from mad_tpu.engine import pipeline as pl

    monkeypatch.setenv("MAD_TPU_CACHE", str(tmp_path))
    monkeypatch.setattr(pl, "_frame_mem", None)
    monkeypatch.setattr(pl, "_frame_adopted", {})
    key = "dockc|pinned|sub"
    assert pl._frames_adopt(key, (48,)) == (48,)
    pl._frames_put(key, (64,))                 # end-of-pass right-sizing
    assert pl._frames_adopt(key, (48,)) == (48,)   # pass 2: unchanged
    # ... but a fresh process (fresh adoption state) picks up the rung.
    monkeypatch.setattr(pl, "_frame_adopted", {})
    assert pl._frames_adopt(key, (48,)) == (64,)


def test_fused_match_cache_roundtrip(monkeypatch, tmp_path, trimer):
    """match_cache no longer forfeits the fused path: the miss run saves the
    table from the fused select's outputs, and the hit run reuses it WITHOUT
    calling the similarity/repeatability programs (match_pairs) or falling
    back to the split path (match_descriptors) — solutions equal both ways."""
    from mad_tpu.engine import docking as dk

    cfg, sub, copies, dmap, map_dsc, sub_dsc = trimer
    cfg = cfg.replace(filter=dataclasses.replace(cfg.filter,
                                                 rescue_rounds=1))
    path = str(tmp_path / "matching.h5")
    monkeypatch.setenv("MAD_TPU_FUSED_DOCK", "1")
    plain = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                           n_copies=3, verbose=False)
    miss = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                          n_copies=3, verbose=False, match_cache=path)
    assert (tmp_path / "matching.h5").exists()

    def boom(*a, **k):
        raise AssertionError("similarity path ran on a match-cache hit")

    monkeypatch.setattr(dk, "match_pairs", boom)
    monkeypatch.setattr(dk, "match_descriptors", boom)
    hit = dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                         n_copies=3, verbose=False, match_cache=path)
    assert len(plain) == len(miss) == len(hit) >= 3
    for a, b in zip(plain, miss):
        assert a.weight == b.weight
        assert a.structure.rmsd_ca_with(b.structure) < 1e-3
    for a, b in zip(miss, hit):
        assert a.weight == b.weight
        assert a.repeat == pytest.approx(b.repeat, abs=1e-4)
        assert a.ccc == pytest.approx(b.ccc, abs=1e-5)
        assert a.structure.rmsd_ca_with(b.structure) < 1e-3


def test_fused_no_pairs(monkeypatch, trimer):
    cfg, sub, copies, dmap, map_dsc, sub_dsc = trimer
    cfg = cfg.replace(match=dataclasses.replace(cfg.match,
                                                cc_threshold=1.01))
    monkeypatch.setenv("MAD_TPU_FUSED_DOCK", "1")
    assert dock_structure(map_dsc, sub_dsc, sub, dmap, 8.0, cfg,
                          n_copies=3, verbose=False) == []
