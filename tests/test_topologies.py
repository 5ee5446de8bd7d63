"""Symmetric / helical assembly topologies (round-4 verdict item 2).

The reference's flagship systems are genuinely symmetric or helical: VAT C6
hexamer (/root/reference/run_MaD.py:24-27), GroEL D7 double ring (notebook
cells 24-27), actin:tropomyosin helical filament x5 (run_MaD.py:29-33).
Symmetry-related copies have near-identical local density environments, so
descriptor matches are degenerate across copies and pose clustering must
disambiguate aliased poses. make_symmetric_assembly builds TRUE
symmetry-related copy orientations (not random per-copy rotations); the
e2e tests assert every copy is recovered AND that recovered copies claim
distinct solutions (aliasing resolved).
"""

import numpy as np
import pytest

from mad_tpu.testing import (TOPOLOGY_REGIMES, make_symmetric_assembly,
                             run_topology)


# ---------------------------------------------------------------------------
# Fast tier: generator geometry invariants.
# ---------------------------------------------------------------------------

def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def test_cn_copies_are_symmetry_images():
    sub, copies = make_symmetric_assembly("cn", 6, n_res=40, radius=20.0)
    assert len(copies) == 6
    for i, c in enumerate(copies):
        want = copies[0].coords @ _rz(2 * np.pi * i / 6).T
        np.testing.assert_allclose(c.coords, want, atol=1e-9)


def test_dn_bottom_ring_is_c2_image():
    n = 4
    sub, copies = make_symmetric_assembly("dn", n, n_res=40, radius=20.0,
                                          ring_dz=18.0)
    assert len(copies) == 2 * n
    flip = np.diag([1.0, -1.0, -1.0])
    for i in range(n):
        np.testing.assert_allclose(copies[n + i].coords,
                                   copies[i].coords @ flip.T, atol=1e-9)
    # Top ring sits above z=0, bottom below.
    assert all(c.center()[2] > 0 for c in copies[:n])
    assert all(c.center()[2] < 0 for c in copies[n:])


def test_helix_copies_follow_screw_axis():
    rise, twist = 25.0, np.deg2rad(-100.0)
    sub, copies = make_symmetric_assembly("helix", 5, n_res=40, radius=12.0,
                                          rise=rise, twist=twist)
    screw = _rz(twist)
    for i in range(4):
        want = copies[i].coords @ screw.T + np.array([0.0, 0.0, rise])
        np.testing.assert_allclose(copies[i + 1].coords, want, atol=1e-9)


def test_symmetric_copies_do_not_overlap():
    for regime in TOPOLOGY_REGIMES:
        kw = {k: regime[k] for k in ("radius", "ring_dz", "rise", "twist")
              if k in regime}
        _, copies = make_symmetric_assembly(
            regime["kind"], regime["n"], n_res=regime["n_res"],
            seed=regime["seed"], **kw)
        centers = np.stack([c.center() for c in copies])
        d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        # Adjacent copies touch but centers stay apart (no collapsed ring).
        assert d.min() > 10.0, (regime["name"], d.min())


# ---------------------------------------------------------------------------
# Fast tier: one small symmetric dock (C3, coarse) — the degenerate-match
# regime exercised cheaply.
# ---------------------------------------------------------------------------

def test_c3_symmetric_dock_small():
    res = run_topology(
        dict(name="C3_small", cite="fast-tier variant", kind="cn", n=3,
             n_res=70, radius=24.0, resolution=12.0, voxsp=3.0, seed=31,
             run_kwargs=dict(cc_threshold=0.5)),
        rescue_rounds=0, max_anchors=1024)
    assert res["recovered"] == 3, res
    assert res["distinct_claimed"] == 3, res


# ---------------------------------------------------------------------------
# Slow tier: the reference-scale topology matrix.
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("regime", TOPOLOGY_REGIMES,
                         ids=[r["name"] for r in TOPOLOGY_REGIMES])
def test_topology_recovers_all_copies(regime):
    res = run_topology(regime)
    assert res["recovered"] == res["n_copies"], res
    # Aliasing resolved: every recovered copy claims a distinct solution.
    assert res["distinct_claimed"] == res["n_copies"], res
    good = [r for r in res["rmsds"] if r < res["threshold"]]
    assert np.median(good) < res["threshold"] / 2.0, res
