import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from mad_tpu.ops.convolve import (conv1d_along, gaussian_filter3d,
                                  gaussian_kernel1d, log_filter3d, upsample2)


def test_gaussian_kernel_matches_scipy():
    from scipy.ndimage._filters import _gaussian_kernel1d
    for sigma, order in [(1.0, 0), (2.0, 0), (2.0, 2), (1.5, 2)]:
        radius = int(4.0 * sigma + 0.5)
        ref = _gaussian_kernel1d(sigma, order, radius)[::-1]
        got = gaussian_kernel1d(sigma, order)
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_conv1d_same_matches_numpy():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(6, 5, 8)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25], dtype=np.float32)
    out = np.asarray(conv1d_along(jnp.asarray(vol), k, axis=2))
    ref = np.stack([
        np.stack([np.convolve(vol[i, j], k, mode="same")
                  for j in range(5)]) for i in range(6)])
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_conv1d_full_grows():
    vol = jnp.ones((3, 3, 4), dtype=jnp.float32)
    k = np.ones(5, dtype=np.float32)
    out = conv1d_along(vol, k, axis=2, mode="full")
    assert out.shape == (3, 3, 8)


def test_gaussian_filter3d_matches_scipy_interior():
    rng = np.random.default_rng(1)
    vol = np.zeros((24, 24, 24), dtype=np.float32)
    vol[8:16, 8:16, 8:16] = rng.normal(size=(8, 8, 8))
    got = np.asarray(gaussian_filter3d(jnp.asarray(vol), 2.0))
    ref = ndimage.gaussian_filter(vol, 2.0)
    # zero-padding vs reflect differs only near borders; data is interior
    np.testing.assert_allclose(got[4:-4, 4:-4, 4:-4],
                               ref[4:-4, 4:-4, 4:-4], atol=1e-4)


def test_log_filter_matches_scipy_interior():
    rng = np.random.default_rng(2)
    vol = np.zeros((28, 28, 28), dtype=np.float32)
    vol[10:18, 10:18, 10:18] = np.abs(rng.normal(size=(8, 8, 8)))
    sigma = 2.0
    log_got, gauss_got = log_filter3d(jnp.asarray(vol), sigma)
    ref = -ndimage.gaussian_laplace(vol, sigma) * sigma ** 2
    ref[ref < 0] = 0
    np.testing.assert_allclose(np.asarray(log_got)[6:-6, 6:-6, 6:-6],
                               ref[6:-6, 6:-6, 6:-6], atol=1e-4)
    refg = ndimage.gaussian_filter(vol, sigma)
    np.testing.assert_allclose(np.asarray(gauss_got)[6:-6, 6:-6, 6:-6],
                               refg[6:-6, 6:-6, 6:-6], atol=1e-4)


def test_banded_matmul_matches_shift_add(monkeypatch):
    """The TPU banded-matmul conv path (one MXU contraction per axis) must
    reproduce the shift-and-add results; forced on here on CPU."""
    from mad_tpu.ops import convolve as cv

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(20, 18, 17)).astype(np.float32)
    k0 = gaussian_kernel1d(1.6, 0)
    ref_g = np.asarray(gaussian_filter3d(jnp.asarray(vol), 1.6))
    ref_log, ref_gauss = log_filter3d(jnp.asarray(vol), 1.6)
    ref_full = np.asarray(conv1d_along(jnp.asarray(vol), k0, 1,
                                       mode="full"))
    ref_up = np.asarray(upsample2(jnp.asarray(vol)))

    monkeypatch.setattr(cv, "_banded_ok", lambda n, ksz: True)
    np.testing.assert_allclose(
        np.asarray(gaussian_filter3d(jnp.asarray(vol), 1.6)), ref_g,
        atol=2e-5)
    log_b, gauss_b = log_filter3d(jnp.asarray(vol), 1.6)
    np.testing.assert_allclose(np.asarray(log_b), np.asarray(ref_log),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gauss_b), np.asarray(ref_gauss),
                               atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(conv1d_along(jnp.asarray(vol), k0, 1, mode="full")),
        ref_full, atol=2e-5)
    np.testing.assert_allclose(np.asarray(upsample2(jnp.asarray(vol))),
                               ref_up, atol=2e-5)


def test_upsample2_shape_and_exactness():
    # Linear ramps are reproduced exactly by Catmull-Rom; original samples kept.
    x, y, z = np.meshgrid(np.arange(6.0), np.arange(5.0), np.arange(7.0),
                          indexing="ij")
    vol = (2 * x + 3 * y - z).astype(np.float32)
    up = np.asarray(upsample2(jnp.asarray(vol)))
    assert up.shape == (11, 9, 13)
    np.testing.assert_allclose(up[::2, ::2, ::2], vol, atol=1e-5)
    interior = up[2:-2, 2:-2, 2:-2]
    xx, yy, zz = np.meshgrid(np.arange(11.0), np.arange(9.0),
                             np.arange(13.0), indexing="ij")
    ref = (xx + 1.5 * yy - 0.5 * zz)[2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(interior, ref, atol=1e-4)
