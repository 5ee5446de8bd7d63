import numpy as np
import pytest

from mad_tpu.native import get_fastio
from mad_tpu.core.structure import (parse_pdb, _parse_pdb_python, write_pdb)
from mad_tpu.testing import make_protein

needs_native = pytest.mark.skipif(get_fastio() is None,
                                  reason="no C toolchain")


@needs_native
def test_native_pdb_matches_python(tmp_path):
    p = make_protein(n_res=60, seed=3)
    path = str(tmp_path / "t.pdb")
    write_pdb(p, path)
    a = parse_pdb(path)
    b = _parse_pdb_python(path)
    np.testing.assert_allclose(a.coords, b.coords)
    np.testing.assert_allclose(a.masses, b.masses)
    np.testing.assert_array_equal(a.ca_idx, b.ca_idx)
    np.testing.assert_array_equal(a.bb_idx, b.bb_idx)
    assert a.info == b.info


@needs_native
def test_native_float_parser():
    m = get_fastio()
    vals = np.frombuffer(m.parse_floats(b"1.5 -2.25e1\n 3  \t4.0"),
                         dtype=np.float64)
    np.testing.assert_allclose(vals, [1.5, -22.5, 3.0, 4.0])


@needs_native
def test_native_skips_malformed_lines(tmp_path):
    path = str(tmp_path / "m.pdb")
    with open(path, "w") as fh:
        fh.write("HEADER    junk\n")
        fh.write("ATOM      1  CA  ALA A   1      11.000  12.000  13.000"
                 "  1.00  0.00           C\n")
        fh.write("ATOM   bad line\n")
        fh.write("HETATM    2  O   HOH B   2      21.000  22.000  23.000"
                 "  1.00  0.00           O\n")
    s = parse_pdb(path)
    assert s.n_atoms == 2
    np.testing.assert_allclose(s.coords[0], [11, 12, 13])
    assert s.info[1][6] == "HETATM"
    assert s.info[1][3] == "B"
