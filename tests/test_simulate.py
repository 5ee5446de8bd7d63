import numpy as np
import pytest

from mad_tpu.ops.simulate import plan_simulation, simulate_density
from mad_tpu.testing import make_protein


def test_single_atom_gaussian_blob():
    coords = np.array([[10.0, 12.0, 8.0]])
    g = simulate_density(coords, resolution=8.0, voxsp=2.0)
    assert g.data.max() == pytest.approx(1.0)
    # Peak voxel should be at the atom position
    idx = np.unravel_index(np.argmax(g.data), g.shape)
    pos = np.asarray(idx) * g.voxsp + g.origin
    np.testing.assert_allclose(pos, coords[0], atol=g.voxsp)
    # Radial symmetry: sigma from second moment matches res/(pi*sqrt(2))
    xs = [np.arange(s) * g.voxsp + g.origin[i] for i, s in enumerate(g.shape)]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    w = g.data / g.data.sum()
    var = ((X - coords[0, 0]) ** 2 * w).sum()
    sigma_expected = 8.0 / (np.pi * np.sqrt(2))
    # truncated kernel + trilinear spread: loose tolerance
    assert abs(np.sqrt(var) - sigma_expected) < 0.5


def test_mass_weighting():
    # Two atoms, one heavy: the heavy one should dominate the density.
    coords = np.array([[0.0, 0.0, 0.0], [12.0, 0.0, 0.0]])
    masses = np.array([55.0, 12.0], dtype=np.float32)
    g = simulate_density(coords, resolution=6.0, voxsp=2.0, masses=masses)
    idx = np.unravel_index(np.argmax(g.data), g.shape)
    pos = np.asarray(idx) * g.voxsp + g.origin
    np.testing.assert_allclose(pos, coords[0], atol=g.voxsp)


def test_plan_origin_arithmetic():
    coords = np.array([[5.0, 5.0, 5.0], [15.0, 9.0, 7.0]])
    plan = plan_simulation(coords, resolution=8.0, voxsp=2.0)
    # Origin = registered min - (blur radius + margin) * voxsp
    sigma = 8.0 / (np.pi * np.sqrt(2)) / 2.0
    r = int(np.ceil(3 * sigma))
    np.testing.assert_allclose(plan.out_origin,
                               np.array([4.0, 4.0, 4.0]) - (r + 2) * 2.0)


def test_isovalue_clamp():
    p = make_protein(n_res=20, seed=0, n_segments=1)
    g = simulate_density(p, resolution=8.0, voxsp=2.0, isovalue=0.3)
    d = g.data
    assert ((d == 0) | (d >= 0.3)).all()
