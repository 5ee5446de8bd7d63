import numpy as np
import pytest

from mad_tpu.core.config import RefineConfig
from mad_tpu.engine.refine import refine_candidates
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_protein


@pytest.fixture(scope="module")
def system():
    p = make_protein(n_res=30, seed=2, n_segments=2)
    dmap = simulate_density(p, resolution=8.0, voxsp=2.0).reduce_void(8)
    return p, dmap


def test_refine_recovers_small_perturbation(system):
    p, dmap = system
    rng = np.random.default_rng(0)
    # Perturb: 2 A translation + ~4 degree rotation about the centroid
    ang = np.deg2rad(4.0)
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    center = p.coords.mean(axis=0)
    pert = (p.coords - center) @ R + center + np.array([1.5, -1.0, 0.8])
    start = pert[None].astype(np.float32)
    cfg = RefineConfig(n_steps=200)
    res = refine_candidates(dmap, start, cfg)
    rmsd_before = np.sqrt(((pert - p.coords) ** 2).sum(1).mean())
    rmsd_after = np.sqrt(((res.coords[0] - p.coords) ** 2).sum(1).mean())
    assert rmsd_after < rmsd_before * 0.5
    assert rmsd_after < 1.0


def test_refine_batched_candidates_independent(system):
    p, dmap = system
    shifts = np.array([[1.0, 0, 0], [0, 1.5, 0], [-1.0, 0, 0.5]])
    starts = np.stack([p.coords + s for s in shifts]).astype(np.float32)
    cfg = RefineConfig(n_steps=120)
    res = refine_candidates(dmap, starts, cfg)
    for i in range(3):
        rmsd = np.sqrt(((res.coords[i] - p.coords) ** 2).sum(1).mean())
        assert rmsd < 1.0, (i, rmsd)


def test_refine_segmented_equals_monolithic(system):
    """Segmented refinement (converged-candidate compaction) reproduces the
    monolithic while_loop bitwise: every step is lane-independent, so
    compacting frozen lanes cannot change any trajectory."""
    import dataclasses
    struct, dmap = system
    rng = np.random.default_rng(3)
    # 18 candidates (>= 16 triggers segmentation) with mixed perturbations:
    # small ones converge quickly, larger ones late -> real compaction.
    starts = np.stack([
        struct.coords + rng.normal(scale=0.2 + 0.4 * (i % 3), size=3)
        for i in range(18)
    ]).astype(np.float32)
    mono = refine_candidates(
        dmap, starts, dataclasses.replace(RefineConfig(), segment_steps=0,
                                          cascade=False))
    segd = refine_candidates(
        dmap, starts, dataclasses.replace(RefineConfig(), segment_steps=64,
                                          cascade=False))
    np.testing.assert_array_equal(mono.converged, segd.converged)
    np.testing.assert_array_equal(mono.steps, segd.steps)
    np.testing.assert_array_equal(mono.rot, segd.rot)
    np.testing.assert_array_equal(mono.trans, segd.trans)
    np.testing.assert_array_equal(mono.coords, segd.coords)


def test_refine_cascade_equals_monolithic(system):
    """The one-program cascade (on-device survivor compaction at adaptive
    phase boundaries) reproduces the monolithic while_loop bitwise: lane
    permutation and frame slicing touch no per-lane arithmetic."""
    import dataclasses
    struct, dmap = system
    rng = np.random.default_rng(7)
    starts = np.stack([
        struct.coords + rng.normal(scale=0.2 + 0.4 * (i % 3), size=3)
        for i in range(18)
    ]).astype(np.float32)
    mono = refine_candidates(
        dmap, starts, dataclasses.replace(RefineConfig(), segment_steps=0,
                                          cascade=False))
    casc = refine_candidates(
        dmap, starts, dataclasses.replace(RefineConfig(), cascade=True))
    np.testing.assert_array_equal(mono.converged, casc.converged)
    np.testing.assert_array_equal(mono.steps, casc.steps)
    np.testing.assert_array_equal(mono.rot, casc.rot)
    np.testing.assert_array_equal(mono.trans, casc.trans)
    np.testing.assert_array_equal(mono.coords, casc.coords)
