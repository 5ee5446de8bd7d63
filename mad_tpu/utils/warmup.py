"""Concurrent ahead-of-time compilation of the describe-side programs.

Cold start is compile-bound, not compute-bound: the first run of the
pipeline triggers one XLA compile per (program, shape), and on tunneled TPU
hosts the remote compile service costs 15-40 s per program (STATUS.md).
The describe-side programs' shapes are fully determined by (grid shape,
config), so they can be lowered up front and compiled on a thread pool —
overlapping the service round-trips instead of paying them serially.

Shapes that depend on data (matched-pair counts, candidate counts) cannot
be precompiled exactly and are left to first use; the describe side
dominates the compile inventory (2 octaves x {log, grad, detect, orient,
describe} per distinct grid bucket).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import MadConfig, bucket


def _octave_params(grid_shape: Tuple[int, int, int], cfg: MadConfig):
    """(dims, real_shape, upsampled) per octave for a raw grid shape,
    mirroring ops/scalespace._prepare + iter_lazy_octaves."""
    ss = cfg.scalespace
    real = tuple(s + 2 * ss.map_padding for s in grid_shape)
    dims = tuple(bucket(s, cfg.shape_bucket) for s in real)
    out = []
    if ss.oct_mode in ("up", "both"):
        out.append((dims, tuple(2 * s - 1 for s in real), True))
    if ss.oct_mode in ("base", "both"):
        out.append((dims, real, False))
    return out


def pipeline_programs(grid_shape: Tuple[int, int, int], cfg: MadConfig,
                      describe_caps: Sequence[int] = ()):
    """Yield (jitted_fn, abstract_args) for every describe-side program the
    pipeline will need for a grid of ``grid_shape`` (pre-padding voxels).

    describe_caps: oriented-lane capacities to prewarm for the descriptor
    program; data-dependent, so callers pass the buckets they expect (the
    overflow capacity cfg.describe.max_descriptors is the common case on
    dense maps).
    """
    from ..ops import scalespace as ssp
    from ..ops.describe import _compiled_describe
    from ..ops.detect import _compiled_detect
    from ..ops.orient import _compiled_orient

    ss, det, ori, dsc = cfg.scalespace, cfg.detect, cfg.orient, cfg.describe
    radius = (ori.patch_size - ori.patch_size % 2) // 2
    f32 = jnp.float32

    for dims, real_shape, up in _octave_params(grid_shape, cfg):
        vol = jax.ShapeDtypeStruct(dims, f32)
        args = (dims, float(ss.detect_sigma), float(ss.presmooth_sigma),
                up, float(ss.truncate))
        log_fn = ssp._compiled_log(*args)
        n_vox = 1
        for s in real_shape:
            n_vox *= s
        gdtype = ("bfloat16" if n_vox > ssp.LazyOctave.BF16_VOXELS
                  else "float32")
        grad_fn = ssp._compiled_grad(*args, dtype=gdtype)
        yield log_fn, (vol,)
        yield grad_fn, (vol,)

        log_shape = jax.eval_shape(log_fn, vol).shape
        det_fn = _compiled_detect(log_shape, real_shape,
                                  float(det.threshold_abs),
                                  int(det.exclude_border),
                                  float(det.max_offset),
                                  int(det.newton_iters),
                                  int(det.max_anchors))
        yield det_fn, (jax.ShapeDtypeStruct(log_shape, f32),)

        grad_sd = jax.eval_shape(grad_fn, vol)
        stride = 2 if up else 1
        ori_fn = _compiled_orient(grad_sd.shape[:3], real_shape, stride,
                                  radius, ori.eqsp_size, ori.max_main,
                                  ori.max_sec, float(ori.cutoff_magn),
                                  float(ori.gw_sig), 128)
        # Anchor compaction (engine/pipeline.py) floors the orient batch at
        # 512 valid-first anchors; that is the program real octaves hit.
        k = min(512, int(det.max_anchors))
        yield ori_fn, (grad_sd, jax.ShapeDtypeStruct((k, 3), jnp.int32),
                       jax.ShapeDtypeStruct((k,), jnp.bool_))

        for cap in describe_caps:
            dsc_fn = _compiled_describe(grad_sd.shape[:3], real_shape,
                                        bool(up), radius, dsc.subeqsp_size,
                                        dsc.subregions,
                                        float(dsc.cutoff_magn),
                                        float(dsc.zero_magn), 128)
            yield dsc_fn, (grad_sd,
                           jax.ShapeDtypeStruct((cap, 3), jnp.int32),
                           jax.ShapeDtypeStruct((cap, 3, 3), f32),
                           jax.ShapeDtypeStruct((cap,), jnp.bool_))


def warm_pipeline(grid_shapes: Iterable[Tuple[int, int, int]],
                  cfg: Optional[MadConfig] = None,
                  describe_caps: Sequence[int] = (),
                  max_workers: int = 8, block: bool = True):
    """AOT-compile the describe-side programs for the given grid shapes on
    a thread pool. Returns the executor's futures; with block=True waits
    and surfaces the first failure."""
    cfg = cfg or MadConfig()
    seen = set()
    jobs = []
    for shape in grid_shapes:
        for fn, abstract in pipeline_programs(tuple(shape), cfg,
                                              describe_caps):
            key = (id(fn), tuple((a.shape, str(a.dtype)) for a in abstract))
            if key in seen:
                continue
            seen.add(key)
            jobs.append((fn, abstract))

    pool = cf.ThreadPoolExecutor(max_workers=max_workers)
    futures = [pool.submit(lambda f=fn, a=abstract: f.lower(*a).compile())
               for fn, abstract in jobs]
    pool.shutdown(wait=False)
    if block:
        for f in futures:
            f.result()
    return futures
