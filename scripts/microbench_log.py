"""Micro-attribution of the oct0 log_detect program (diagnostic).

Times, at the bench map's upsampled-octave shape:
  * the LoG-only program (upsample + presmooth + LoG),
  * the full log_detect (adds maxpool + top-k + Newton),
  * a single banded conv at HIGHEST / HIGH / DEFAULT precision,
  * maxpool+top-k alone.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def t(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from mad_tpu.ops.scalespace import _compiled_log, _compiled_log_detect
    from mad_tpu.ops.convolve import gaussian_kernel1d, _banded_matrix
    from mad_tpu.utils.warmup import replay
    replay(block=False)

    dims = (291, 294, 280)
    real = tuple(2 * s - 1 for s in dims)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(dims, dtype=np.float32))

    log_fn = _compiled_log(dims, 2.0, 1.0, True, 4.0)
    print(f"log-only (up+presmooth+LoG): {t(log_fn, vol)*1e3:.1f} ms",
          flush=True)

    ld_fn = _compiled_log_detect(dims, 2.0, 1.0, True, 4.0, real, 5e-2, 12,
                                 0.6, 5, 4096, 512)
    print(f"log_detect full: {t(ld_fn, vol)*1e3:.1f} ms", flush=True)

    big = jnp.asarray(rng.random(real, dtype=np.float32))
    k = gaussian_kernel1d(2.0, 0, 4.0)
    B = _banded_matrix(k.astype(np.float32).tobytes(), len(k), real[0],
                       "same")
    for prec in ("highest", "high", "default"):
        f = jax.jit(lambda v, B=B, p=prec: jnp.moveaxis(
            jnp.tensordot(v, B, axes=((0,), (0,)), precision=p), -1, 0))
        print(f"single banded conv axis0 @ {real[0]} prec={prec}: "
              f"{t(f, big)*1e3:.1f} ms", flush=True)

    def mp_topk(v):
        pooled = lax.reduce_window(v, -jnp.inf, lax.max, (3, 3, 3),
                                   (1, 1, 1), "SAME")
        is_peak = (v >= pooled) & (v > 5e-2)
        scores = jnp.where(is_peak, v, -jnp.inf).reshape(-1)
        block = 4096
        pad = (-scores.shape[0]) % block
        seg = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
        seg = seg.reshape(-1, block)
        svals, scols = lax.top_k(seg, 512)
        vals, sub = lax.top_k(svals.reshape(-1), 4096)
        return vals

    f = jax.jit(mp_topk)
    print(f"maxpool+topk: {t(f, big)*1e3:.1f} ms", flush=True)

    # upsample alone
    from mad_tpu.ops.convolve import upsample2
    f = jax.jit(upsample2)
    print(f"upsample2 (to {real}): {t(f, vol)*1e3:.1f} ms", flush=True)

    # presmooth + LoG alone at full size
    from mad_tpu.ops.convolve import gaussian_filter3d, log_filter3d
    f = jax.jit(lambda v: gaussian_filter3d(v, 1.0, 4.0))
    print(f"presmooth sig=1: {t(f, big)*1e3:.1f} ms", flush=True)
    f = jax.jit(lambda v: log_filter3d(v, 2.0, 4.0)[0])
    print(f"LoG sig=2: {t(f, big)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
