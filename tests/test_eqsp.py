import numpy as np
import pytest

from mad_tpu.core.eqsp import EQSPSphere, get_eqsp


@pytest.mark.parametrize("size", [16, 112])
def test_partition_structure(size):
    e = EQSPSphere(size)
    assert e.bounds.shape == (size, 4)
    # Zone areas are equal: area = (theta_max-theta_min)*(cos phi_min - cos phi_max)
    th = e.bounds[:, 2] - e.bounds[:, 0]
    areas = th * (np.cos(e.bounds[:, 1]) - np.cos(e.bounds[:, 3]))
    np.testing.assert_allclose(areas, e.zone_area(), rtol=1e-10)
    # Caps first/last
    assert e.belts[0] == [0] and e.belts[-1] == [size - 1]


def test_reference_16_belt_layout():
    # The 16-zone sphere: cap + 7 + 7 + cap, second belt offset by half width
    e = EQSPSphere(16)
    assert [len(b) for b in e.belts] == [1, 7, 7, 1]
    np.testing.assert_allclose(e.bounds[0, 3], np.arccos(1 - 2 / 16), rtol=1e-12)
    np.testing.assert_allclose(e.bounds[8, 0], 2 * np.pi / 14, rtol=1e-10)


def test_zone_lookup_consistent_with_bounds():
    e = get_eqsp(112)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(5000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    z = e.zone_of_vectors(v)
    th = np.arctan2(v[:, 1], v[:, 0])
    th = np.where(th < 0, th + 2 * np.pi, th)
    ph = np.arccos(np.clip(v[:, 2], -1, 1))
    b = e.bounds[z]
    # phi within zone bounds
    assert np.all((ph >= b[:, 1] - 1e-9) & (ph <= b[:, 3] + 1e-9))
    # theta within bounds modulo 2pi (wrap zones exceed 2pi)
    in_theta = ((th >= b[:, 0] - 1e-9) & (th <= b[:, 2] + 1e-9)) | \
               ((th + 2 * np.pi >= b[:, 0] - 1e-9) & (th + 2 * np.pi <= b[:, 2] + 1e-9))
    assert np.all(in_theta)


def test_centers_map_to_own_zone():
    for size in (16, 112):
        e = get_eqsp(size)
        z = e.zone_of(e.p_centers[:, 0], e.p_centers[:, 1])
        np.testing.assert_array_equal(z, np.arange(size))


def test_belt_first_theta():
    e = get_eqsp(112)
    for z in range(e.size):
        belt = e.belt_of_zone[z]
        first = e.belts[belt][0]
        assert e.belt_first_theta[z] == e.p_centers[first, 0]
