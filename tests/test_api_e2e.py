"""End-to-end session test: self-fit of a synthetic dimer with the decoy
transform protocol (the reference's de-facto correctness check,
SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from mad_tpu.api import MaD
from mad_tpu.core.structure import write_pdb, parse_pdb
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.core.grid import write_mrc
from mad_tpu.testing import make_assembly


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    sub, copies = make_assembly(n_copies=2, n_res=60, seed=4, spread=16.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses)
    map_path = str(root / "dimer_map.mrc")
    write_mrc(dmap, map_path)
    sub_path = str(root / "subunit.pdb")
    write_pdb(copies[0], sub_path)
    return root, map_path, sub_path, copies


def test_full_session(system):
    root, map_path, sub_path, copies = system
    mad = MaD(workdir=str(root))
    mad.add_map(map_path, resolution=8.0)
    mad.add_subunit(sub_path, n_copies=2)
    mad.run(transform_subunits=True)
    # solutions exist and recover both copies
    key = "subunit"
    sols = mad.solutions[key]
    assert len(sols) >= 2
    for c in copies:
        best = min(s.structure.rmsd_ca_with(c) for s in sols)
        assert best < 4.0, best

    # artifact tree parity
    out = mad.out_folder
    assert os.path.isdir(os.path.join(out, "initial_files"))
    assert os.path.isdir(os.path.join(out, "individual_solutions"))
    assert os.path.exists(os.path.join(out, f"Solutions_refined_{key}.csv"))
    sols_dir = os.path.join(out, "individual_solutions")
    assert any(f.startswith("sol_") for f in os.listdir(sols_dir))
    assert os.path.isdir(os.path.join(sols_dir, "anchor_files"))
    # descriptor cache populated and reusable
    db = os.path.join(str(root), "dsc_db")
    assert len(os.listdir(db)) >= 2

    # assembly building
    mad.build_assembly()
    models_dir = os.path.join(out, "assembly_models")
    assert os.path.isdir(models_dir)
    models = [f for f in os.listdir(models_dir) if f.startswith("Model_")]
    assert models
    m1 = parse_pdb(os.path.join(models_dir, "Model_1.pdb"))
    total = sum(c.n_atoms for c in copies)
    assert m1.n_atoms == total
    assert os.path.exists(os.path.join(out, "complex_ranking.csv"))
