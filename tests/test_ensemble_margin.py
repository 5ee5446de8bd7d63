"""Ensemble decision-metric margin (round-4 verdict item 10).

The reference reports the conformer its MaD score ranks first
(super_score = Repeatability * Weight * mCC, mad/MaD.py:622-625;
mad_utils.py:297 shows the GroEL ladder it validates on). At bench scale
the round-4 run won by 5.3x, but nothing pinned that margin — a
regression shrinking it to 1.1x would still "rank first". This test docks
a 3-conformer ladder (true + 4 A + 8 A smooth deformations) on a 3-copy
system and asserts the true conformer's mean RWmCC leads the best decoy
by >= 2x.
"""

import os

import numpy as np
import pytest

from mad_tpu.api import MaD
from mad_tpu.core.grid import write_mrc
from mad_tpu.core.structure import write_pdb
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import deform_structure, make_assembly

pytestmark = pytest.mark.slow


def test_true_conformer_rwmcc_margin(tmp_path):
    root = str(tmp_path)
    sub, copies = make_assembly(n_copies=3, n_res=90, seed=12, spread=26.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 9.0, 2.25, masses=masses)
    map_path = os.path.join(root, "ens_map.mrc")
    write_mrc(dmap, map_path)

    ens = os.path.join(root, "conformers")
    os.makedirs(ens)
    write_pdb(sub, os.path.join(ens, "conf_true.pdb"))
    for scale in (4.0, 8.0):
        d = deform_structure(sub, scale, seed=int(scale))
        write_pdb(d, os.path.join(ens, f"conf_{int(scale)}A.pdb"))

    mad = MaD(workdir=root)
    mad.add_map(map_path, resolution=9.0)
    mad.add_subunit(ens, n_copies=3, identifier="conformers")
    mad.run(transform_subunits=True)
    rankings = mad.score_ensembles()

    rows = rankings["conformers"]
    assert len(rows) == 3
    # row layout: (frame, mean Repeatability, mean Weight, mean mCC,
    # mean RWmCC) — parity mad/MaD.py:243-275
    rwmcc = {r[0]: r[4] for r in rows}
    true_score = rwmcc.pop("conf_true")
    best_decoy = max(rwmcc.values())
    assert true_score >= 2.0 * best_decoy, (true_score, rwmcc)
