"""Manifest-replay warmup: record -> replay -> executable reuse.

Cold starts on tunneled TPU hosts are compile/cache-load bound; replay()
must not only compile the recorded inventory concurrently but also hand
those executables to the first real calls (jit's dispatch cache does not
share lower().compile() results).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from mad_tpu.utils import warmup


@pytest.fixture()
def isolated_manifest(tmp_path, monkeypatch):
    monkeypatch.setenv("MAD_TPU_CACHE", str(tmp_path))
    monkeypatch.setattr(warmup, "_manifest_mem", None)
    monkeypatch.setattr(warmup, "_exe_cache", {})
    return tmp_path


def _pack_overlap_args():
    rng = np.random.default_rng(0)
    dens = jnp.asarray(rng.random((8, 4, 4, 4)).astype(np.float32))
    offs = jnp.zeros((8, 3), jnp.int32)
    return dens, offs


def test_record_replay_exe_reuse(isolated_manifest):
    from mad_tpu.engine.assemble import _compiled_pack_overlap
    _compiled_pack_overlap.cache_clear()

    fn = _compiled_pack_overlap(8, (4, 4, 4), (8, 8), 1)
    assert isinstance(fn, warmup._WarmProxy)
    dens, offs = _pack_overlap_args()
    ref = np.asarray(fn(dens, offs))

    # first call recorded a manifest entry
    man = json.load(open(warmup._manifest_path()))
    assert len(man) == 1

    # replay compiles it into the executable cache
    warmup._exe_cache.clear()
    futs = warmup.replay(block=True)
    assert futs and len(warmup._exe_cache) == 1

    # a fresh matching call is served by the replayed executable: sabotage
    # the dispatch path; only the exe path can produce the result
    fn2 = _compiled_pack_overlap(8, (4, 4, 4), (8, 8), 1)
    orig = fn2._fn
    try:
        fn2._fn = None
        out = np.asarray(fn2(dens, offs))
    finally:
        fn2._fn = orig
    np.testing.assert_allclose(out, ref)


def test_masked_signature_ignores_scalar_values():
    sig = [["arr", [4, 4], "float32"], ["np", "int32", 7.0], ["py", 3]]
    m = warmup._masked(sig)
    assert m == [["arr", [4, 4], "float32"], ["np", "int32"], ["py", "int"]]
    # the same program serves every scalar value
    sig2 = [["arr", [4, 4], "float32"], ["np", "int32", 99.0], ["py", 5]]
    assert warmup._masked(sig2) == m


def test_eviction_is_per_platform(isolated_manifest, monkeypatch):
    monkeypatch.setattr(warmup, "_MANIFEST_MAX", 3)
    for i in range(5):
        warmup._record("m:f", (i,), {}, [["py", 1]], "cpu")
    warmup._record("m:f", (99,), {}, [["py", 1]], "tpu")
    for i in range(5, 9):
        warmup._record("m:f", (i,), {}, [["py", 1]], "cpu")
    man = json.load(open(warmup._manifest_path()))
    plats = [json.loads(k)[0] for k in man]
    assert plats.count("cpu") == 3          # capped
    assert plats.count("tpu") == 1          # survived cpu churn


def test_exe_fallback_on_stale_entry(isolated_manifest):
    """A poisoned executable entry falls back to the dispatch path."""
    from mad_tpu.engine.assemble import _compiled_pack_overlap
    _compiled_pack_overlap.cache_clear()
    fn = _compiled_pack_overlap(8, (4, 4, 4), (8, 8), 1)
    dens, offs = _pack_overlap_args()
    ref = np.asarray(fn(dens, offs))

    class Boom:
        def __call__(self, *a):
            raise RuntimeError("stale")

    key = warmup._exe_key(fn._platform, fn._qual, fn._args, fn._kwargs,
                          warmup._masked(warmup._sig_of((dens, offs))))
    warmup._exe_cache[key] = Boom()
    out = np.asarray(fn(dens, offs))
    np.testing.assert_allclose(out, ref)
    assert key not in warmup._exe_cache     # dropped after the failure


def test_replay_only_filter(isolated_manifest):
    """replay(only=...) restricts the warm to matching program names —
    the staged warm that keeps the map-build chain from queueing behind
    the full inventory on serializing compile services."""
    from mad_tpu.engine.assemble import _compiled_pack_overlap
    _compiled_pack_overlap.cache_clear()
    fn = _compiled_pack_overlap(8, (4, 4, 4), (8, 8), 1)
    dens, offs = _pack_overlap_args()
    np.asarray(fn(dens, offs))          # record

    warmup._exe_cache.clear()
    futs = warmup.replay(block=True, only=("nonexistent_stage",))
    assert futs == [] or len(warmup._exe_cache) == 0
    futs = warmup.replay(block=True, only=("assemble",))
    assert len(warmup._exe_cache) == 1


def test_pipeline_programs_fused_inventory():
    """Shapes under the fused-octave gate prewarm exactly one chain
    program per octave (the split trio otherwise)."""
    from mad_tpu.core.config import MadConfig
    cfg = MadConfig()
    names = [getattr(fn, "_qual", "?").rsplit(":", 1)[-1]
             for fn, _a in warmup.pipeline_programs((96, 96, 96), cfg)]
    assert names == ["_compiled_octave_chain"] * 2
