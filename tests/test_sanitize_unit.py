"""Fast-tier unit coverage of the stage-mode sanitizer (ADVICE r4).

The full-pipeline NaN localization test (test_misc_components) is slow
tier; this pins the sanitizer's stage-localization mechanics — queueing,
one-pull flush, first-bad-stage naming, flag passthrough — on a trivial
three-stage pipeline so regressions surface in the fast tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mad_tpu.utils import sanitize


@pytest.fixture(autouse=True)
def stage_mode(monkeypatch):
    monkeypatch.setenv("MAD_TPU_NANCHECK", "1")
    sanitize.clear()
    yield
    sanitize.clear()


def test_flush_names_bad_stages_in_one_pull():
    sanitize.watch("stage_a", jnp.ones(4))
    sanitize.watch("stage_b", jnp.array([1.0, np.nan]))
    sanitize.watch("stage_c", jnp.full(3, np.inf))
    with pytest.raises(FloatingPointError, match="stage_b, stage_c"):
        sanitize.flush()
    # queue drained: a second flush is a no-op
    sanitize.flush()


def test_clean_pipeline_flushes_silently():
    for name in ("s1", "s2", "s3"):
        sanitize.watch(name, jnp.arange(8, dtype=jnp.float32))
    sanitize.flush()


def test_watch_flag_rides_fused_programs():
    """watch_flag is the fused-octave path: the array never leaves the
    program, only its precomputed all-finite flag does."""
    sanitize.watch_flag("fused_ok", jnp.all(jnp.isfinite(jnp.ones(3))))
    sanitize.watch_flag("fused_bad",
                        jnp.all(jnp.isfinite(jnp.array([np.nan]))))
    with pytest.raises(FloatingPointError, match="fused_bad"):
        sanitize.flush()


def test_non_float_and_none_arrays_ignored():
    sanitize.watch("ints", jnp.arange(4), None)
    sanitize.flush()


def test_check_host_raises_immediately():
    with pytest.raises(FloatingPointError, match="host_stage"):
        sanitize.check_host("host_stage", np.array([np.nan]))


def test_off_mode_is_free(monkeypatch):
    monkeypatch.setenv("MAD_TPU_NANCHECK", "0")
    sanitize.watch("ignored", jnp.array([np.nan]))
    sanitize.flush()
