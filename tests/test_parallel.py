import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mad_tpu.ops.convolve import log_filter3d
from mad_tpu.parallel.mesh import make_mesh
from mad_tpu.parallel.volume import sharded_log_gspmd, sharded_log_shardmap
from mad_tpu.parallel.pairs import sharded_similarity_topk


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


@needs_devices
def test_sharded_similarity_topk():
    rng = np.random.default_rng(1)
    hi = jnp.asarray(rng.random((64, 128)), dtype=jnp.float32)
    lo = jnp.asarray(rng.random((64, 128)), dtype=jnp.float32)
    mesh = make_mesh(4)
    k = 16
    vals, rows, cols = sharded_similarity_topk(hi, lo, k, mesh)
    sim = np.asarray(hi) @ np.asarray(lo).T
    ref = np.sort(sim.reshape(-1))[::-1][:k]
    np.testing.assert_allclose(np.sort(np.asarray(vals))[::-1], ref,
                               atol=1e-5)
    # Each reported (row, col) reproduces its value
    for v, r, c in zip(np.asarray(vals), np.asarray(rows), np.asarray(cols)):
        assert abs(sim[r, c] - v) < 5e-5


@needs_devices
def test_multichip_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
