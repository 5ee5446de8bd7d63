"""Gaussian/LoG scale-space construction on device.

Replaces MapSpace.build_space (mad/MapSpace.py:69-189):
  * optional x2 upsampled octave (cubic, presmoothed),
  * per octave: scale-normalized negative LoG (clamped at 0), plus the
    gradient of the Gaussian-smoothed grid for orientation/descriptors.

Everything per shape is jitted once; grids are bucketed by the caller so a
run over many structures reuses a handful of compiled programs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import ScaleSpaceConfig, bucket
from ..core.grid import DensityGrid
from .convolve import gaussian_filter3d, log_filter3d, upsample2


@dataclass
class Octave:
    """One scale-space octave, device-resident."""

    voxsp: float
    log: jnp.ndarray          # (X, Y, Z) clamped -sigma^2 * LoG
    grad: jnp.ndarray         # (X, Y, Z, 3) gradient of Gaussian-smoothed grid
    real_shape: Tuple[int, int, int]  # data extent before bucket padding


@dataclass
class ScaleSpace:
    octaves: List[Octave]
    origin: np.ndarray        # shared map origin (A) after padding
    name: str = ""


@functools.lru_cache(maxsize=32)
def _compiled_build(shape: Tuple[int, int, int], sig_init: float,
                    sig_presmooth: float, oct_mode: str, truncate: float):
    def one_octave(vol):
        log_resp, gauss = log_filter3d(vol, sig_init, truncate)
        gx, gy, gz = jnp.gradient(gauss)
        return log_resp, jnp.stack([gx, gy, gz], axis=-1)

    def build(vol):
        outs = []
        if oct_mode in ("up", "both"):
            up = upsample2(vol)
            if sig_presmooth:
                up = gaussian_filter3d(up, sig_presmooth, truncate)
            outs.append(one_octave(up))
        if oct_mode in ("base", "both"):
            outs.append(one_octave(vol))
        return outs

    return jax.jit(build)


def build_scale_space(grid: DensityGrid, cfg: ScaleSpaceConfig,
                      shape_bucket: int = 32) -> ScaleSpace:
    """Pad, bucket and filter a density grid into its octaves."""
    data = grid.device()
    origin = grid.origin.copy()
    if cfg.map_padding:
        data = jnp.pad(data, cfg.map_padding, mode="constant")
        origin = origin - cfg.map_padding * grid.voxsp
    real = tuple(data.shape)
    dims = tuple(bucket(s, shape_bucket) for s in real)
    if dims != real:
        data = jnp.pad(data, [(0, d - r) for d, r in zip(dims, real)])
    fn = _compiled_build(dims, float(cfg.detect_sigma),
                         float(cfg.presmooth_sigma), cfg.oct_mode,
                         float(cfg.truncate))
    outs = fn(data)
    octaves = []
    idx = 0
    if cfg.oct_mode in ("up", "both"):
        log_resp, grad = outs[idx]
        idx += 1
        octaves.append(
            Octave(voxsp=grid.voxsp / 2.0, log=log_resp, grad=grad,
                   real_shape=tuple(2 * s - 1 for s in real))
        )
    if cfg.oct_mode in ("base", "both"):
        log_resp, grad = outs[idx]
        octaves.append(
            Octave(voxsp=grid.voxsp, log=log_resp, grad=grad, real_shape=real)
        )
    return ScaleSpace(octaves=octaves, origin=origin, name=grid.name)
