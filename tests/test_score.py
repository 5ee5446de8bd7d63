"""Batched CCC scoring vs a direct NumPy implementation of the reference's
overlap-box semantics (mad/Dmap.py:153-258): both the map norm AND the
candidate norm are taken over the overlap box only, so candidates hugging
(or poking past) the map border score identically in both implementations
(round-3 IMPLEMENTATION_NOTES deviation 7, now eliminated)."""

import numpy as np
import pytest

from mad_tpu.core.grid import DensityGrid
from mad_tpu.engine.score import batched_ccc, ccc_structures


def _ref_ccc(map_data, map_origin, voxsp, model, model_origin):
    """Reference-style overlap-box CCC (mad/Dmap.py:170-234): intersect the
    two boxes by origin arithmetic, normalized dot product over the
    intersection only."""
    ms = np.asarray(map_data.shape)
    cs = np.asarray(model.shape)
    start = np.rint((np.asarray(model_origin)
                     - np.asarray(map_origin)) / voxsp).astype(int)
    lo = np.maximum(start, 0)
    hi = np.minimum(start + cs, ms)
    if np.any(lo >= hi):
        return 0.0
    a = map_data[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    b = model[lo[0] - start[0]:hi[0] - start[0],
              lo[1] - start[1]:hi[1] - start[1],
              lo[2] - start[2]:hi[2] - start[2]]
    denom = np.sqrt(np.vdot(a, a) * np.vdot(b, b))
    return float(np.vdot(a, b) / max(denom, 1e-30))


@pytest.mark.parametrize("offset", [
    (0, 0, 0),            # interior
    (-6, 0, 0),           # pokes past the low-x face
    (18, 18, 18),         # corner-hugging, mostly outside
])
def test_batched_ccc_matches_reference_crop(offset):
    rng = np.random.default_rng(3)
    voxsp = 2.0
    map_data = rng.random((24, 24, 24)).astype(np.float32)
    dmap = DensityGrid(data=map_data, origin=np.zeros(3), voxsp=voxsp)
    model = rng.random((12, 12, 12)).astype(np.float32)
    model_origin = (np.asarray([6.0, 6.0, 6.0])
                    + np.asarray(offset)) * voxsp / 2.0
    # keep origins lattice-registered like simulate output
    model_origin = voxsp * np.round(model_origin / voxsp)

    got = batched_ccc(dmap, model[None], model_origin[None])
    want = _ref_ccc(map_data, dmap.origin, voxsp, model, model_origin)
    assert got[0] == pytest.approx(want, abs=1e-5)
    if offset != (0, 0, 0):
        assert want > 0.0          # the overlap region is non-trivial


def test_edge_solution_not_deflated():
    """An identical density placed at the border scores the same CCC as one
    placed at the center (the pre-fix scorer deflated the border one by
    counting its out-of-map voxels in the model norm)."""
    rng = np.random.default_rng(5)
    voxsp = 2.0
    blob = rng.random((10, 10, 10)).astype(np.float32)
    map_data = np.zeros((40, 40, 40), np.float32)
    map_data[14:24, 14:24, 14:24] = blob       # interior copy
    map_data[0:10, 14:24, 14:24] = blob        # face-hugging copy
    dmap = DensityGrid(data=map_data, origin=np.zeros(3), voxsp=voxsp)

    model = np.zeros((14, 14, 14), np.float32)
    model[2:12, 2:12, 2:12] = blob
    center_origin = np.array([12.0, 12.0, 12.0]) * voxsp
    # face copy: the model box extends 2 voxels PAST the low-x map face
    edge_origin = np.array([-2.0, 12.0, 12.0]) * voxsp
    got = batched_ccc(dmap, np.stack([model, model]),
                      np.stack([center_origin, edge_origin]))
    assert got[0] == pytest.approx(1.0, abs=1e-5)
    assert got[1] == pytest.approx(got[0], abs=1e-5)


def test_ccc_structures_interior_high():
    """Sanity: a structure scored against its own simulated map gives a
    near-1 CCC through the batched path."""
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.testing import make_protein

    p = make_protein(n_res=40, seed=1, n_segments=2)
    g = simulate_density(p, 8.0, 2.0)
    ccc = ccc_structures(g, p.coords[None], p.masses, 8.0)
    assert ccc[0] > 0.98
