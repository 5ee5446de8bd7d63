"""Stage-level numerical sanitizer (SURVEY §5 sanitizers row).

``MAD_TPU_NANCHECK=1`` enables STAGE mode: pipeline stages register their
key outputs with ``watch()``, which queues a device-side all-isfinite
reduction (async — no extra host sync); the consolidated host pulls the
pipeline already performs call ``flush()``, which drains the queue in one
``device_get`` and raises a FloatingPointError naming the first stage that
produced a non-finite value. This localizes a NaN/inf to its stage with
zero recompiles and one cheap reduction per watched array — unlike the
global ``jax_debug_nans`` mode (``MAD_TPU_NANCHECK=global``), which
re-runs whole jitted programs un-jitted to find the producing primitive.

Typical debug flow: run with =1 to find the stage in seconds, then =global
(or ``set_nan_checks(True)``) on a reduced case to find the primitive.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp


def mode() -> str:
    """"off" | "stage" | "global" (from MAD_TPU_NANCHECK)."""
    v = os.environ.get("MAD_TPU_NANCHECK", "")
    if v in ("", "0"):
        return "off"
    if v.lower() in ("global", "2"):
        return "global"
    return "stage"


_pending: List[Tuple[str, jnp.ndarray]] = []


def watch(stage_name: str, *arrays) -> None:
    """Queue an isfinite check of the floating arrays (stage mode only).

    The reduction is dispatched asynchronously on device; nothing syncs
    until the next flush()."""
    if mode() != "stage":
        return
    for a in arrays:
        if a is None or not hasattr(a, "dtype"):
            continue
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        _pending.append((stage_name, jnp.all(jnp.isfinite(
            a.astype(jnp.float32)))))


def watch_flag(stage_name: str, flag) -> None:
    """Queue a precomputed all-finite flag (stage mode only) — for arrays
    that never leave a fused program, whose finiteness reduction rides
    along as an extra program output (engine/pipeline fused octave)."""
    if mode() != "stage":
        return
    _pending.append((stage_name, flag))


def flush() -> None:
    """Drain queued checks in ONE device_get; raise naming the first stage
    that produced non-finite values. No-op when nothing is queued."""
    if not _pending:
        return
    items, _pending[:] = list(_pending), []
    flags = jax.device_get([f for _, f in items])
    bad = [name for (name, _), ok in zip(items, flags) if not ok]
    if bad:
        raise FloatingPointError(
            "MaD> non-finite values produced in stage(s): "
            + ", ".join(dict.fromkeys(bad))
            + " (rerun with MAD_TPU_NANCHECK=global to locate the "
            "primitive)")


def check_host(stage_name: str, *arrays) -> None:
    """Host-side variant for stages whose outputs are already pulled."""
    if mode() != "stage":
        return
    import numpy as np
    for a in arrays:
        if a is None:
            continue
        a = np.asarray(a)
        if not np.issubdtype(a.dtype, np.floating):
            continue
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(
                f"MaD> non-finite values produced in stage {stage_name} "
                "(rerun with MAD_TPU_NANCHECK=global to locate the "
                "primitive)")


def clear() -> None:
    _pending.clear()
