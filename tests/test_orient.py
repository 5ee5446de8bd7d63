import numpy as np
import jax.numpy as jnp

from mad_tpu.core.config import OrientConfig, DescribeConfig
from mad_tpu.core.eqsp import get_eqsp
from mad_tpu.ops.detect import Anchors
from mad_tpu.ops.orient import orient_anchors, _sphere_mask
from mad_tpu.ops.describe import describe_anchors, region_ids


def _field_two_dirs(shape, d_a, d_b):
    """Field = d_a where (x+y+z) % 3 != 0 else d_b (vectorized)."""
    x, y, z = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    sel = ((x + y + z) % 3 != 0)[..., None]
    return np.where(sel, d_a, d_b).astype(np.float32)


def _field_const(shape, d):
    return np.broadcast_to(np.asarray(d, np.float32), shape + (3,)).copy()


def _anchors(coords, cap=128):
    k = cap
    c = np.zeros((k, 3), np.int32)
    v = np.zeros(k, bool)
    c[: len(coords)] = coords
    v[: len(coords)] = True
    return Anchors(coords=jnp.asarray(c), subvox=jnp.asarray(c, jnp.float32),
                   values=jnp.zeros(k), valid=jnp.asarray(v))


def test_two_direction_patch_orients_main_to_pole():
    eqsp = get_eqsp(112)
    d_main = np.array([1.0, 0.3, 0.2])
    d_main /= np.linalg.norm(d_main)
    d_sec = np.cross(d_main, [0, 0, 1.0])
    d_sec /= np.linalg.norm(d_sec)
    shape = (40, 40, 40)
    grad = _field_two_dirs(shape, d_main, d_sec)  # ~2/3 main, 1/3 sec
    anch = _anchors([[20, 20, 20]])
    cfg = OrientConfig()
    ori = orient_anchors(jnp.asarray(grad), anch, shape, upsampled=False,
                         cfg=cfg, chunk=128)
    ok = np.asarray(ori.valid)
    assert ok[0].any()
    # The dominant direction maps to +z under every valid R_final
    m, s = np.nonzero(ok[0])
    R = np.asarray(ori.rfinal)[0, m[0], s[0]]
    out = R @ d_main
    assert out[2] > 0.9
    # main bin is the EQSP zone of the dominant direction
    z_main = eqsp.zone_of_vectors(d_main[None])[0]
    assert np.asarray(ori.main_bin)[0, m[0]] == z_main


def test_uniform_field_yields_degenerate_anchor():
    # All gradients exactly at a zone center: the pole rotation sends every
    # direction to the pole itself, so no secondary orientation exists ->
    # anchor dropped (parity: mad/Orientator.py:228-231). A generic uniform
    # direction would land *off*-pole (rotation targets the zone center) and
    # legitimately produce secondary candidates.
    eqsp = get_eqsp(112)
    d = eqsp.c_centers[30].astype(np.float32)
    shape = (40, 40, 40)
    grad = _field_const(shape, d)
    anch = _anchors([[20, 20, 20]])
    ori = orient_anchors(jnp.asarray(grad), anch, shape, upsampled=False,
                         cfg=OrientConfig(), chunk=128)
    assert not np.asarray(ori.valid)[0].any()


def test_border_anchor_rejected():
    shape = (40, 40, 40)
    grad = np.random.default_rng(0).normal(
        size=shape + (3,)).astype(np.float32)
    anch = _anchors([[3, 20, 20]])
    ori = orient_anchors(jnp.asarray(grad), anch, shape, upsampled=False,
                         cfg=OrientConfig(), chunk=128)
    assert not np.asarray(ori.valid)[0].any()


def test_describe_constant_direction_counts():
    # Constant gradient direction + identity frame: every lattice sample
    # falls in the same EQSP zone; each of the 64 subregions holds 64 points.
    eqsp = get_eqsp(16)
    d = np.array([0.48, 0.6, 0.64])
    d /= np.linalg.norm(d)
    shape = (40, 40, 40)
    grad = np.broadcast_to(d, shape + (3,)).astype(np.float32).copy()
    coords = jnp.asarray(np.array([[20, 20, 20]] * 128), jnp.int32)
    rf = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                     (128, 3, 3)).copy())
    valid = jnp.asarray(np.arange(128) < 1)
    desc, ok = describe_anchors(jnp.asarray(grad), coords, rf, valid, shape,
                                upsampled=False, cfg=DescribeConfig(),
                                chunk=128)
    desc = np.asarray(desc)
    assert np.asarray(ok)[0]
    z = eqsp.zone_of_vectors(d[None])[0]
    v = desc[0].reshape(64, 16)
    np.testing.assert_array_equal(v[:, z], 64)
    v2 = v.copy()
    v2[:, z] = 0
    assert v2.sum() == 0
    # invalid lanes are zero
    assert desc[1:].sum() == 0


def test_region_ids_reference_order():
    # 64 subregions, radius 8: region index = y_block*16 + x_block*4 + z_block
    regs = region_ids(8, 64).reshape(16, 16, 16)
    assert regs[0, 0, 0] == 0
    assert regs[0, 0, 4] == 1      # z block advances last dim
    assert regs[4, 0, 0] == 4      # x block advances by 4
    assert regs[0, 4, 0] == 16     # y block advances by 16
    assert regs.max() == 63
    counts = np.bincount(regs.reshape(-1))
    np.testing.assert_array_equal(counts, 64)


def test_sphere_mask_removes_corners():
    m = _sphere_mask(8, 0.0)
    assert m[0, 0, 0] == 0 and m[8, 8, 8] == 1
    assert m[8, 8, 0] == 1  # on-axis boundary voxel kept (<= r * 1.05)
