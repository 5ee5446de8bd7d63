"""Multi-chip product path: the SAME engine kernels run sharded over a
virtual CPU mesh and must reproduce the single-device results (up to ties
between exactly equal similarities).

The reference has no parallelism (SURVEY.md section 2); these tests pin the
new capability: mesh runs of match / refine / describe / dock equal their
single-device runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mad_tpu.core.config import MadConfig, MatchConfig, RefineConfig
from mad_tpu.ops.convolve import log_filter3d
from mad_tpu.parallel.mesh import make_mesh
from mad_tpu.parallel.volume import sharded_log_gspmd, sharded_log_shardmap

pytestmark = pytest.mark.slow


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device CPU mesh")


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((32, 24, 24)), dtype=jnp.float32)


@needs_devices
def test_sharded_log_gspmd_matches_single(vol):
    mesh = make_mesh(4)
    ref_log, ref_g = log_filter3d(vol, 2.0)
    got_log, got_g = sharded_log_gspmd(vol, 2.0, mesh)
    np.testing.assert_allclose(np.asarray(got_log), np.asarray(ref_log),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=1e-5)


@needs_devices
def test_sharded_log_shardmap_matches_single(vol):
    mesh = make_mesh(4)
    ref_log, ref_g = log_filter3d(vol, 2.0)
    got_log, got_g = sharded_log_shardmap(vol, 2.0, mesh)
    np.testing.assert_allclose(np.asarray(got_log), np.asarray(ref_log),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=1e-5)


def _random_sets(n=48, seed=5):
    from mad_tpu.engine.pipeline import DescriptorSet

    rng = np.random.default_rng(seed)

    def rots(k):
        q, _ = np.linalg.qr(rng.normal(size=(k, 3, 3)))
        det = np.linalg.det(q)
        q[:, :, 0] *= np.sign(det)[:, None]
        return q.astype(np.float32)

    def mkset(name):
        desc = rng.integers(0, 50, size=(n, 1024))
        coords = rng.normal(size=(n, 3)) * 12 + 60
        norm = desc.astype(np.float32)
        norm /= np.linalg.norm(norm, axis=1, keepdims=True)
        return DescriptorSet(
            desc=desc.astype(np.int16), desc_norm=norm,
            coords=coords.astype(np.float32), map_coords=coords.astype(float),
            subv_coords=coords.astype(float), rfinal=rots(n),
            octave=np.zeros(n, np.int32),
            anchor_id=np.arange(n, dtype=np.int32),
            main_bin=np.zeros(n, np.int32), sec_bin=np.zeros(n, np.int32),
            name=name)

    return mkset("map"), mkset("sub")


@needs_devices
def test_match_descriptors_mesh_equals_single():
    from mad_tpu.engine.match import match_descriptors

    map_set, sub_set = _random_sets()
    cfg = MatchConfig(cc_threshold=0.6, max_pairs=4096, exact_top=64)
    args = (map_set, sub_set, (64, 64, 64), (0.0, 0.0, 0.0), 2.0, cfg)
    t1 = match_descriptors(*args, min_exact=256)
    t8 = match_descriptors(*args, min_exact=256, mesh=make_mesh(8))
    assert t1.n == t8.n > 256

    # Same pair set with the same scores (compare by pair identity: the
    # table order may differ between runs only at exact ties).
    def keyed(t):
        key = t.hi_idx.astype(np.int64) * 1_000_000 + t.lo_idx
        order = np.argsort(key)
        return key[order], t.cc[order], t.repeat[order], t.rot[order]

    k1, cc1, rep1, rot1 = keyed(t1)
    k8, cc8, rep8, rot8 = keyed(t8)
    np.testing.assert_array_equal(k1, k8)
    np.testing.assert_allclose(cc1, cc8, atol=2e-6)
    np.testing.assert_allclose(rep1, rep8, atol=1e-4)
    np.testing.assert_allclose(rot1, rot8, atol=1e-6)


@needs_devices
def test_refine_mesh_equals_single():
    from mad_tpu.engine.refine import refine_candidates
    from mad_tpu.core.grid import DensityGrid

    rng = np.random.default_rng(2)
    data = rng.random((24, 24, 24)).astype(np.float32)
    dmap = DensityGrid(data=data, origin=np.zeros(3), voxsp=2.0)
    starts = (rng.normal(size=(6, 40, 3)) * 4 + 22).astype(np.float32)
    cfg = RefineConfig(n_steps=40)
    r1 = refine_candidates(dmap, starts, cfg)
    r8 = refine_candidates(dmap, starts, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(r8.coords, r1.coords, atol=1e-4)
    np.testing.assert_array_equal(r8.converged, r1.converged)
    np.testing.assert_array_equal(r8.steps, r1.steps)


@needs_devices
def test_pipeline_mesh_equals_single():
    """The full product path (describe_grid + dock_structure) on a virtual
    8-mesh reproduces the single-device results exactly (the VERDICT
    round-1 'promote multi-chip to product' gate)."""
    import dataclasses

    from mad_tpu.engine.docking import dock_structure
    from mad_tpu.engine.pipeline import describe_grid
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.testing import make_assembly

    cfg = MadConfig()
    # small anchor capacity: same kernels, single-core-CPU-sized buffers
    cfg = cfg.replace(detect=dataclasses.replace(cfg.detect,
                                                 max_anchors=1024))
    sub, copies = make_assembly(n_copies=2, n_res=40, seed=3, spread=14.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses,
                            shape_bucket=cfg.shape_bucket)
    sub_grid = simulate_density(sub, 8.0, 2.0, shape_bucket=cfg.shape_bucket)

    mesh = make_mesh(8)
    map_d1 = describe_grid(dmap, cfg, name="map")
    sub_d1 = describe_grid(sub_grid, cfg, name="sub")
    map_d8 = describe_grid(dmap, cfg, name="map", mesh=mesh)
    sub_d8 = describe_grid(sub_grid, cfg, name="sub", mesh=mesh)

    # describe stage: identical descriptor sets
    for d1, d8 in ((map_d1, map_d8), (sub_d1, sub_d8)):
        assert d1.n == d8.n > 0
        np.testing.assert_array_equal(np.asarray(d1.desc),
                                      np.asarray(d8.desc))
        np.testing.assert_allclose(d1.subv_coords, d8.subv_coords,
                                   atol=1e-6)
        np.testing.assert_allclose(d1.rfinal, d8.rfinal, atol=1e-6)
        np.testing.assert_array_equal(d1.main_bin, d8.main_bin)
        np.testing.assert_array_equal(d1.octave, d8.octave)

    # dock stage: identical solutions
    s1 = dock_structure(map_d1, sub_d1, sub, dmap, 8.0, cfg, n_copies=2,
                        verbose=False)
    s8 = dock_structure(map_d8, sub_d8, sub, dmap, 8.0, cfg, n_copies=2,
                        verbose=False, mesh=mesh)
    assert len(s1) == len(s8) >= 2
    for a, b in zip(s1, s8):
        np.testing.assert_allclose(b.structure.coords, a.structure.coords,
                                   atol=1e-3)
        assert b.weight == a.weight
        assert b.repeat == pytest.approx(a.repeat, abs=1e-3)
        assert b.ccc == pytest.approx(a.ccc, abs=1e-4)
    # and both recover the two copies
    for c in copies:
        assert min(s.structure.rmsd_ca_with(c) for s in s8) < 4.0


@needs_devices
def test_fused_dock_mesh_equals_single():
    """The FUSED dock path — select, post-refine chain and rescue programs
    (engine/dock_fused) — on an 8-device mesh reproduces the single-device
    fused results. rescue_rounds=1 routes through _compiled_dock_post, so
    all three fused programs' shard_map variants are exercised."""
    import dataclasses

    from mad_tpu.engine.docking import dock_structure
    from mad_tpu.engine.pipeline import describe_grid
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.testing import make_assembly

    cfg = MadConfig()
    cfg = cfg.replace(
        detect=dataclasses.replace(cfg.detect, max_anchors=1024),
        filter=dataclasses.replace(cfg.filter, rescue_rounds=1))
    sub, copies = make_assembly(n_copies=2, n_res=40, seed=3, spread=14.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses,
                            shape_bucket=cfg.shape_bucket)
    sub_grid = simulate_density(sub, 8.0, 2.0, shape_bucket=cfg.shape_bucket)

    # Shared (single-device) descriptor sets isolate the dock-path
    # comparison; describe-stage mesh equality is pinned above.
    map_d = describe_grid(dmap, cfg, name="map")
    sub_d = describe_grid(sub_grid, cfg, name="sub")

    s1 = dock_structure(map_d, sub_d, sub, dmap, 8.0, cfg, n_copies=2,
                        verbose=False)
    s8 = dock_structure(map_d, sub_d, sub, dmap, 8.0, cfg, n_copies=2,
                        verbose=False, mesh=make_mesh(8))
    assert len(s1) == len(s8) >= 2
    for a, b in zip(s1, s8):
        np.testing.assert_allclose(b.structure.coords, a.structure.coords,
                                   atol=1e-3)
        assert b.weight == a.weight
        assert b.repeat == pytest.approx(a.repeat, abs=1e-3)
        assert b.ccc == pytest.approx(a.ccc, abs=1e-4)
    for c in copies:
        assert min(s.structure.rmsd_ca_with(c) for s in s8) < 4.0


@needs_devices
def test_multichip_dryrun():
    # 4-device mesh: exercises non-power-of-8 sharding of the same step the
    # driver runs with 8 (compile cache shares most programs with the
    # equality test above when shapes coincide).
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
