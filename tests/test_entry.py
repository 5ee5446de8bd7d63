import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    desc, valid, coords, rfinal = fn(*args)
    assert desc.shape[1] == 1024
    assert desc.shape[0] == valid.shape[0]
    v = np.asarray(valid)
    assert v.any(), "forward pass produced no valid descriptors"
    d = np.asarray(desc)
    assert (d[v].sum(axis=1) > 0).all()
