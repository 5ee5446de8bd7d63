"""Self-contained jittable forward pass: density grid -> descriptor matrix.

This is the pipeline's "inference kernel" (SURVEY.md section 3.3) as one
compiled XLA program: scale space -> anchor detection -> orientation ->
lane compaction -> descriptors, entirely on device with static shapes.
The host-orchestrated path (engine/pipeline.py) reuses the same kernels but
crosses the host boundary between stages for caching and dynamic trimming;
this fused variant is what the benchmark and compile-check drive.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import MadConfig
from ..ops.convolve import log_filter3d, upsample2, gaussian_filter3d
from ..ops import detect as det
from ..ops import orient as ori
from ..ops import describe as dsc


@functools.lru_cache(maxsize=8)
def build_forward(shape: Tuple[int, int, int], cfg: MadConfig,
                  max_anchors: int = 512, max_desc: int = 2048,
                  oct_mode: str = "base"):
    """Returns a jitted fn(grid[f32 shape]) -> (desc, valid, coords, rfinal).

    Single octave ("base") by default to keep the compile small; the full
    product pipeline runs both octaves through the same kernels.
    """
    sscfg, dcfg, ocfg, dscfg = (cfg.scalespace, cfg.detect, cfg.orient,
                                cfg.describe)
    radius = ocfg.patch_size // 2
    detect_fn = det._compiled_detect(
        shape, shape, float(dcfg.threshold_abs), int(dcfg.exclude_border),
        float(dcfg.max_offset), int(dcfg.newton_iters), max_anchors)
    orient_fn = ori._compiled_orient(
        shape, shape, 1, radius, ocfg.eqsp_size, ocfg.max_main, ocfg.max_sec,
        float(ocfg.cutoff_magn), float(ocfg.gw_sig), min(128, max_anchors))
    describe_fn = dsc._compiled_describe(
        shape, shape, False, radius, dscfg.subeqsp_size, dscfg.subregions,
        float(dscfg.cutoff_magn), float(dscfg.zero_magn),
        min(128, max_desc))

    m, s = ocfg.max_main, ocfg.max_sec

    @jax.jit
    def forward(grid):
        log_resp, gauss = log_filter3d(grid, sscfg.detect_sigma,
                                       sscfg.truncate)
        gx, gy, gz = jnp.gradient(gauss)
        grad = jnp.stack([gx, gy, gz], axis=-1)
        pos, subvox, vals, avalid = detect_fn(log_resp)
        mains, secs, rfin, ok = orient_fn(grad, pos, avalid)
        # Device-side lane compaction: valid lanes first, capacity max_desc.
        flat_ok = ok.reshape(-1)
        order = jnp.argsort(~flat_ok, stable=True)[:max_desc]
        lane_anchor = order // (m * s)
        coords = pos[lane_anchor]
        rfl = rfin.reshape(-1, 3, 3)[order]
        lane_ok = flat_ok[order]
        descs, dvalid = describe_fn(grad, coords, rfl, lane_ok)
        return descs, dvalid, coords, rfl

    return forward
