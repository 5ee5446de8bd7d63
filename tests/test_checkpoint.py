"""Pose-search checkpoint: kill-resume of a multi-subunit run.

SURVEY section 5 ("failure detection" row) calls for an optional checkpoint
of pose-search state. Each docked subunit's solution set persists in
pose_db/ (content-addressed by processed coords + dock knobs); a run killed
mid-way resumes at the first un-docked subunit without redoing completed
docks (api.MaD._dock_one).
"""

import os

import numpy as np
import pytest

from mad_tpu.api import MaD
from mad_tpu.core.grid import write_mrc
from mad_tpu.core.structure import write_pdb
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def two_subunit_system(tmp_path_factory):
    """Two distinct subunits (different sizes) in one map."""
    root = tmp_path_factory.mktemp("ckpt")
    sub_a, _ = make_assembly(n_copies=1, n_res=60, seed=4)
    sub_b, _ = make_assembly(n_copies=1, n_res=40, seed=9)
    sub_b = sub_b.with_coords(sub_b.coords - sub_b.center()
                              + [34.0, 0.0, 0.0])
    coords = np.concatenate([sub_a.coords, sub_b.coords])
    masses = np.concatenate([sub_a.masses, sub_b.masses])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses)
    map_path = str(root / "duo_map.mrc")
    write_mrc(dmap, map_path)
    a_path, b_path = str(root / "subA.pdb"), str(root / "subB.pdb")
    write_pdb(sub_a, a_path)
    write_pdb(sub_b, b_path)
    return root, map_path, a_path, b_path, sub_a, sub_b


def _fresh_session(root, map_path, a_path, b_path):
    mad = MaD(workdir=str(root))
    mad.add_map(map_path, resolution=8.0)
    mad.add_subunit(a_path, n_copies=1)
    mad.add_subunit(b_path, n_copies=1)
    return mad


def test_kill_resume(two_subunit_system, monkeypatch):
    root, map_path, a_path, b_path, sub_a, sub_b = two_subunit_system

    # --- first run dies after the FIRST subunit's dock completes ---------
    import mad_tpu.api as api_mod
    real_dock = api_mod.dock_structure
    calls = []

    def dying_dock(*args, **kw):
        if calls:
            raise KeyboardInterrupt("simulated kill mid-run")
        calls.append(1)
        return real_dock(*args, **kw)

    monkeypatch.setattr(api_mod, "dock_structure", dying_dock)
    mad = _fresh_session(root, map_path, a_path, b_path)
    with pytest.raises(KeyboardInterrupt):
        mad.run(transform_subunits=True)
    first_sols = mad.solutions["subA"]
    assert first_sols                         # subunit A completed & saved
    db = os.path.join(str(root), "pose_db")
    assert len(os.listdir(db)) == 1

    # --- resume: A loads from the checkpoint, only B docks ---------------
    dock_keys = []

    def counting_dock(map_set, sub_set, *args, **kw):
        dock_keys.append(sub_set.name)
        return real_dock(map_set, sub_set, *args, **kw)

    monkeypatch.setattr(api_mod, "dock_structure", counting_dock)
    mad2 = _fresh_session(root, map_path, a_path, b_path)
    mad2.run(transform_subunits=True)
    assert dock_keys == ["subB"]              # A was NOT re-docked
    assert len(os.listdir(db)) == 2

    # checkpointed solutions reproduce the first run's exactly
    got = mad2.solutions["subA"]
    assert len(got) == len(first_sols)
    for a, b in zip(first_sols, got):
        np.testing.assert_allclose(b.structure.coords, a.structure.coords)
        np.testing.assert_allclose(b.corresp_anchors, a.corresp_anchors)
        assert (b.repeat, b.weight) == (a.repeat, a.weight)
        assert b.ccc == pytest.approx(a.ccc)
        assert b.score == pytest.approx(a.score)
        assert len(b.members) == len(a.members)
    # both subunits recovered at their deposited poses
    for key, truth in (("subA", sub_a), ("subB", sub_b)):
        best = min(s.structure.rmsd_ca_with(truth)
                   for s in mad2.solutions[key])
        assert best < 4.0, (key, best)
    # artifact contract regenerated on resume
    out = mad2.out_folder
    assert os.path.exists(os.path.join(out, "Solutions_refined_subA.csv"))

    # --- a changed knob invalidates the checkpoint -----------------------
    dock_keys.clear()
    mad3 = _fresh_session(root, map_path, a_path, b_path)
    mad3.run(transform_subunits=True, n_samples=70)
    assert set(dock_keys) == {"subA", "subB"}   # both re-docked
