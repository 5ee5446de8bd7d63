"""Batched device-side CC scoring of simulated grids against the map.

The reference scores every solution/model by simulating its density and
taking a normalized dot product over the overlap box, one at a time on host
(mad/MaD.py:598-599, 737-738; mad/Dmap.py:153-258). Here all candidates
simulate in one vmapped kernel (ops/simulate.batched_simulate) and their
CCCs evaluate in one program: the map is zero-padded so every candidate's
box is a static-size dynamic slice, and zero padding contributes nothing to
either the numerator or the map norm, preserving the reference's
overlap-box semantics for in-map candidates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import bucket
from ..core.grid import DensityGrid
from ..ops.simulate import batched_simulate
from ..utils.warmup import warmable


@functools.lru_cache(maxsize=16)
@warmable
def _compiled_batched_ccc(pad_shape: Tuple[int, int, int],
                          model_shape: Tuple[int, int, int]):
    def run(map_pad, models, starts, in_lo, in_hi):
        """in_lo/in_hi: the real map's index range inside the padded grid.
        Model voxels outside it are cropped from the model norm — the
        reference computes both norms over the overlap box only
        (mad/Dmap.py:170-234), so an edge-hugging candidate's out-of-map
        voxels must not deflate its CCC (round-3 deviation 7, eliminated).
        The map-side norm needs no mask: padding voxels are zero."""
        ax = [jnp.arange(s) for s in model_shape]

        def one(model, start):
            sub = lax.dynamic_slice(
                map_pad, (start[0], start[1], start[2]), model_shape)
            inb = (((ax[0] + start[0] >= in_lo[0])
                    & (ax[0] + start[0] < in_hi[0]))[:, None, None]
                   & ((ax[1] + start[1] >= in_lo[1])
                      & (ax[1] + start[1] < in_hi[1]))[None, :, None]
                   & ((ax[2] + start[2] >= in_lo[2])
                      & (ax[2] + start[2] < in_hi[2]))[None, None, :])
            m = model * inb
            olap = jnp.vdot(sub, m)
            n1 = jnp.vdot(sub, sub)
            n2 = jnp.vdot(m, m)
            return olap / jnp.maximum(jnp.sqrt(n1 * n2), 1e-30)

        return jax.vmap(one)(models, starts)

    return jax.jit(run)


def batched_ccc(dmap: DensityGrid, model_grids, model_origins: np.ndarray,
                shape_bucket: int = 32) -> np.ndarray:
    """CCC of each model grid against the map over the model's own box."""
    m = model_grids.shape[0]
    model_shape = tuple(model_grids.shape[1:])
    starts = np.rint(
        (model_origins - np.asarray(dmap.origin)) / dmap.voxsp).astype(int)
    pad_lo = np.maximum(0, -starts.min(axis=0))
    pad_hi = np.maximum(
        0, (starts + model_shape).max(axis=0) - np.asarray(dmap.shape))
    # Bucket the padded map shape to bound recompilation.
    target = tuple(bucket(int(s + lo + hi), shape_bucket)
                   for s, lo, hi in zip(dmap.shape, pad_lo, pad_hi))
    pad_hi = [t - s - lo for t, s, lo in zip(target, dmap.shape, pad_lo)]
    map_pad = jnp.pad(dmap.device(),
                      list(zip([int(x) for x in pad_lo],
                               [int(x) for x in pad_hi])))
    fn = _compiled_batched_ccc(tuple(map_pad.shape), model_shape)
    out = fn(map_pad, model_grids,
             jnp.asarray(starts + pad_lo, dtype=jnp.int32),
             np.asarray(pad_lo, dtype=np.int32),
             np.asarray(pad_lo + np.asarray(dmap.shape), dtype=np.int32))
    from ..utils import sanitize
    out = np.asarray(out)
    sanitize.check_host("score.ccc", out)
    return out


def ccc_structures(dmap: DensityGrid, coords: np.ndarray, masses: np.ndarray,
                   resolution: float, isovalue: float = 0.0,
                   shape_bucket: int = 16) -> np.ndarray:
    """Simulate M same-sized structures and CC-score them against the map.

    coords: (M, N, 3); masses: (N,) or (M, N). One vmapped simulate + one
    vmapped CCC (replaces M sequential host rounds of
    PDB.structure_to_density + Dmap.get_CCC_with_grid).
    """
    m, n = coords.shape[:2]
    if masses.ndim == 1:
        masses = np.broadcast_to(masses, (m, n))
    grids, origins = batched_simulate(coords, masses, resolution, dmap.voxsp,
                                      isovalue=isovalue,
                                      shape_bucket=shape_bucket)
    return batched_ccc(dmap, grids, origins)
