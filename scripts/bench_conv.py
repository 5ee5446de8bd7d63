"""Micro-benchmark: 1D-convolution strategies for 3D volumes on TPU.

Compares the conv_general_dilated formulation against a shift-and-add
(slice-weighted-sum) formulation for the separable Gaussian passes that
dominate scale-space construction.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mad_tpu.ops.convolve import conv1d_along, gaussian_kernel1d


def conv1d_shift(vol, kernel, axis):
    k = jnp.asarray(kernel, dtype=vol.dtype)
    ksz = k.shape[0]
    r = ksz // 2
    pad = [(0, 0)] * 3
    pad[axis] = (r, ksz - 1 - r)
    padded = jnp.pad(vol, pad)
    n = vol.shape[axis]
    out = jnp.zeros_like(vol)
    for i in range(ksz):
        idx = [slice(None)] * 3
        idx[axis] = slice(i, i + n)
        out = out + k[ksz - 1 - i] * padded[tuple(idx)]
    return out


def main():
    shape = (546, 552, 524)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(shape).astype(np.float32))
    g0 = gaussian_kernel1d(2.0, 0)
    print("kernel size", len(g0), "volume", shape,
          "%.0f MB" % (np.prod(shape) * 4 / 1e6))

    for name, fn in [
        ("conv_general", lambda v: conv1d_along(
            conv1d_along(conv1d_along(v, g0, 0), g0, 1), g0, 2)),
        ("shift_add", lambda v: conv1d_shift(
            conv1d_shift(conv1d_shift(v, g0, 0), g0, 1), g0, 2)),
    ]:
        jf = jax.jit(fn)
        t0 = time.time()
        out = jf(vol)
        out.block_until_ready()
        print(f"{name}: compile+run {time.time() - t0:.2f}s")
        t0 = time.time()
        for _ in range(3):
            out = jf(vol)
        out.block_until_ready()
        print(f"{name}: steady {(time.time() - t0) / 3 * 1000:.1f} ms "
              f"(3 axes)")
        ref = None

    # agreement check on a small volume
    small = jnp.asarray(rng.random((64, 60, 56)).astype(np.float32))
    a = conv1d_along(small, g0, 1)
    b = conv1d_shift(small, g0, 1)
    print("maxdiff", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
