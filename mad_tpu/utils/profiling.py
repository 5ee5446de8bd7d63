"""Per-stage timing + optional device profiling.

Replaces the reference's ad-hoc wall-clock accumulators
(mad/Orientator.py:57-61, 275-288; mad/Descriptor.py:99, 208-215) with a
process-wide stage-timer registry, and wraps ``jax.profiler`` for device
traces when requested.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

import jax

_STAGES: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str, sync: bool = False):
    """Accumulate wall-clock for a named pipeline stage. With sync=True,
    blocks on outstanding device work so the number is honest."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.block_until_ready(
                    jax.device_put(0.0))  # cheap fence
            except Exception:
                pass
        _STAGES[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def show_timing(reset: bool = False) -> Dict[str, float]:
    """Print the per-stage table (parity: Orientator.show_timing)."""
    total = sum(_STAGES.values())
    print("MaD> Step timing:")
    for name in sorted(_STAGES, key=_STAGES.get, reverse=True):
        print("     %-24s %8.2f s  (%d calls)"
              % (name, _STAGES[name], _COUNTS[name]))
    print("     %-24s %8.2f s" % ("Total:", total))
    out = dict(_STAGES)
    if reset:
        _STAGES.clear()
        _COUNTS.clear()
    return out


def get_timings() -> Dict[str, float]:
    return dict(_STAGES)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/mad_tpu_trace"):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
