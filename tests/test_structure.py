import numpy as np

from mad_tpu.core.structure import parse_pdb, write_pdb, write_complex
from mad_tpu.testing import make_protein, make_assembly


def test_pdb_roundtrip(tmp_path):
    p = make_protein(n_res=10, seed=0, n_segments=1)
    path = str(tmp_path / "t.pdb")
    write_pdb(p, path)
    p2 = parse_pdb(path)
    assert p2.n_atoms == p.n_atoms
    np.testing.assert_allclose(p2.coords, p.coords, atol=1e-3)
    np.testing.assert_array_equal(p2.ca_idx, p.ca_idx)
    np.testing.assert_allclose(p2.masses, p.masses)


def test_rmsd_ca(tmp_path):
    p = make_protein(n_res=10, seed=0, n_segments=1)
    q = p.with_coords(p.coords + np.array([1.0, 2.0, 2.0]))
    assert abs(p.rmsd_ca_with(q) - 3.0) < 1e-9
    assert abs(p.rmsd_with(q) - 3.0) < 1e-9


def test_transformed():
    p = make_protein(n_res=8, seed=1, n_segments=1)
    R = np.eye(3)
    t = np.array([5.0, 0, 0])
    q = p.transformed(R, t)
    np.testing.assert_allclose(q.coords, p.coords + t)


def test_write_complex_chains(tmp_path):
    sub, copies = make_assembly(n_copies=2, n_res=6, seed=0)
    path = str(tmp_path / "c.pdb")
    write_complex(copies, path)
    chains = set()
    for line in open(path):
        if line.startswith("ATOM"):
            chains.add(line[21])
    assert chains == {"A", "B"}
