"""Fused describe chain: static capacity frames + overflow redo.

The single-device pipeline runs with speculative static frames (512
anchors, describe.static_lanes lanes) and zero per-octave syncs; octaves
that overflow must redo at full capacity and produce IDENTICAL results.
"""

import dataclasses

import numpy as np
import pytest

from mad_tpu.core.config import MadConfig
from mad_tpu.engine.pipeline import describe_grid
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def system():
    sub, copies = make_assembly(n_copies=2, n_res=50, seed=6, spread=15.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    cfg = MadConfig()
    cfg = cfg.replace(detect=dataclasses.replace(cfg.detect,
                                                 max_anchors=1024))
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses,
                            shape_bucket=cfg.shape_bucket)
    return cfg, dmap


def _assert_sets_equal(a, b):
    assert a.n == b.n > 0
    np.testing.assert_array_equal(np.asarray(a.desc), np.asarray(b.desc))
    np.testing.assert_allclose(a.subv_coords, b.subv_coords, atol=0)
    np.testing.assert_allclose(a.rfinal, b.rfinal, atol=0)
    np.testing.assert_array_equal(a.main_bin, b.main_bin)
    np.testing.assert_array_equal(a.sec_bin, b.sec_bin)
    np.testing.assert_array_equal(a.anchor_id, b.anchor_id)
    np.testing.assert_array_equal(a.octave, b.octave)


def test_static_frames_do_not_change_results(system):
    """The speculative frames are a pure execution-shape choice: the
    default frames, the full-capacity frames the overflow redo would use,
    and an oversized lane frame all return identical rows."""
    from mad_tpu.core.config import bucket
    cfg, dmap = system
    d_ref = describe_grid(dmap, cfg, name="m")
    assert d_ref.n > 0
    full = (cfg.detect.max_anchors,
            min(bucket(cfg.describe.max_descriptors, 128),
                cfg.detect.max_anchors * cfg.orient.max_main
                * cfg.orient.max_sec))
    d_full = describe_grid(dmap, cfg, name="m", _caps=full)
    _assert_sets_equal(d_full, d_ref)
    d_big = describe_grid(dmap, cfg, name="m", _caps=(512, 4096))
    _assert_sets_equal(d_big, d_ref)


def test_rung_ladder():
    from mad_tpu.engine.pipeline import _rung
    assert _rung(100, 512, 16384) == 512
    assert _rung(513, 512, 16384) == 1024      # 513*1.25 -> 1024
    assert _rung(2349, 512, 16384) == 3072     # ~25% headroom, 512-granular
    assert _rung(999999, 512, 16384) == 16384
    assert _rung(0, 512, 16384) == 512
    # headroom absorbs jitter: a count just under the rung stays put
    assert _rung(2400, 512, 16384) == 3072


def test_frame_memory_roundtrip(tmp_path, monkeypatch):
    import importlib
    from mad_tpu.engine import pipeline as pl
    monkeypatch.setenv("MAD_TPU_CACHE", str(tmp_path))
    monkeypatch.setattr(pl, "_frame_mem", None)
    assert pl._frames_get("x|(1,2,3)") is None
    pl._frames_put("x|(1,2,3)", (512, 4096))
    assert pl._frames_get("x|(1,2,3)") == (512, 4096)
    # survives a fresh in-process load (new module state)
    monkeypatch.setattr(pl, "_frame_mem", None)
    assert pl._frames_get("x|(1,2,3)") == (512, 4096)


def test_overflow_redo_uses_rung_not_full(system, tmp_path, monkeypatch):
    """A lane overflow must redo at the next power-of-2 rung and remember
    it; the second describe call must run a single right-sized chain."""
    import dataclasses
    from mad_tpu.engine import pipeline as pl
    cfg, dmap = system
    monkeypatch.setenv("MAD_TPU_CACHE", str(tmp_path))
    monkeypatch.setattr(pl, "_frame_mem", None)
    monkeypatch.setattr(pl, "_frame_adopted", {})
    # Tiny speculative lane frame: every octave overflows it.
    small = dataclasses.replace(cfg.describe, static_lanes=128)
    cfg_small = cfg.replace(describe=small)
    d = pl.describe_grid(dmap, cfg_small, name="ov")
    d_ref = pl.describe_grid(dmap, cfg, name="ref")
    _assert_sets_equal(d, d_ref)
    key = f"ov|{tuple(dmap.shape)}"
    caps = pl._frames_get(key)
    assert caps is not None
    full_l = cfg.describe.max_descriptors
    assert caps[1] < full_l          # rung, not the full frame
    assert caps[1] >= d.n            # but holds the real lane count


def test_whole_octave_chain_equals_split(system, monkeypatch):
    """The whole-octave fused program (one dispatch: LoG+detect+grad+
    orient+describe) returns exactly the split three-program path's rows —
    same bodies, same compaction, same descriptors."""
    from mad_tpu.engine import pipeline as pl
    cfg, dmap = system
    d_fused = describe_grid(dmap, cfg, name="m")       # default: fused
    monkeypatch.setattr(pl, "FUSE_OCTAVE_VOXELS", 0)   # force split
    d_split = describe_grid(dmap, cfg, name="m")
    _assert_sets_equal(d_fused, d_split)
