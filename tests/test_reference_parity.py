"""Parity tests against the actual reference implementation.

These run the reference's own modules (read-only at /root/reference) on the
same inputs as the mad_tpu kernels and compare outputs. The image lacks
skimage/mrcfile, so minimal shims are injected; the reference code itself is
untouched. Skipped when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def refmod():
    """Import reference modules with dependency shims, CWD at the ref root
    (EQSP_Sphere loads data files relative to CWD, mad/eqsp/eqsp.py:16)."""
    # Shared shim, itself pinned against a brute-force oracle over the
    # plateau/tie/border edge cases in tests/test_peak_shim.py — so this
    # parity comparison is not circular on the shim's semantics.
    from ref_shims import peak_local_max

    sk = types.ModuleType("skimage")
    skf = types.ModuleType("skimage.feature")
    skf.peak_local_max = peak_local_max
    sk.feature = skf
    mrc = types.ModuleType("mrcfile")
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.feature", skf)
    sys.modules.setdefault("mrcfile", mrc)

    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        from mad.MapSpace import MapSpace
        from mad.Detector import Detector
        from mad.Orientator import Orientator
        from mad.Descriptor import Descriptor
        from mad.DensityFeature import DensityFeature
        from mad import PDB as refPDB
    finally:
        os.chdir(cwd)
    return dict(MapSpace=MapSpace, Detector=Detector, Orientator=Orientator,
                Descriptor=Descriptor, DensityFeature=DensityFeature,
                PDB=refPDB.PDB)


@pytest.fixture(scope="module")
def make_tiny(tmp_path_factory):
    """Factory for synthetic test proteins (parity sweeps over seeds)."""
    from mad_tpu.testing import make_protein
    from mad_tpu.core.structure import write_pdb

    cache = {}

    def mk(seed=11, n_res=40):
        key = (seed, n_res)
        if key not in cache:
            p = make_protein(n_res=n_res, seed=seed, n_segments=2)
            path = str(tmp_path_factory.mktemp(f"ref{seed}_{n_res}")
                       / "tiny.pdb")
            write_pdb(p, path)
            cache[key] = (path, p)
        return cache[key]

    return mk


@pytest.mark.parametrize("seed,res", [(11, 8.0), (23, 8.0), (37, 12.0)])
def test_simulate_parity(refmod, make_tiny, seed, res):
    """structure_to_density: same grid, same origin (mad/PDB.py:131-208),
    swept over seeds and resolutions."""
    path, p = make_tiny(seed)
    from mad_tpu.ops.simulate import simulate_density
    ref_pdb = refmod["PDB"](path)
    ref_grid, xi, yi, zi = ref_pdb.structure_to_density(res, 2.0)
    mine = simulate_density(p, res, 2.0, shape_bucket=1)
    np.testing.assert_allclose(mine.origin, [xi, yi, zi], atol=1e-6)
    sx, sy, sz = ref_grid.shape
    np.testing.assert_allclose(mine.data[:sx, :sy, :sz], ref_grid, atol=2e-4)
    assert abs(mine.data[:sx, :sy, :sz] - ref_grid).mean() < 1e-5


@pytest.mark.parametrize("seed,res", [(11, 8.0), (23, 8.0), (11, 12.0)])
def test_anchor_parity_from_sit(refmod, make_tiny, tmp_path, seed, res):
    """Full scale-space + detection: every reference anchor has a mad_tpu
    anchor within 1 voxel (statistical parity: subvoxel paths differ by
    design — spline vs Catmull-Rom upsampling, SURVEY.md section 7);
    swept over seeds and resolutions."""
    path, p = make_tiny(seed)
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.core.grid import write_sit
    from mad_tpu.ops.scalespace import build_scale_space
    from mad_tpu.ops.detect import detect_anchors
    from mad_tpu.core.config import MadConfig
    cfg = MadConfig()

    g = simulate_density(p, res, 2.0, shape_bucket=1)
    sit = str(tmp_path / "tiny.sit")
    write_sit(g, sit)

    ms = refmod["MapSpace"](sit, map_padding=9, oct_mode="both", sig_init=2,
                            sig_presmooth=1)
    ms.build_space()
    det = refmod["Detector"]()
    ref_anchors = det.find_anchors(ms)

    ss = build_scale_space(g, cfg.scalespace, shape_bucket=1)
    mine = {}
    for oi, octv in enumerate(ss.octaves):
        a = detect_anchors(octv.log, octv.real_shape, cfg.detect)
        valid = np.asarray(a.valid)
        mine[oi] = np.asarray(a.subvox)[valid]

    assert len(ref_anchors) > 0
    matched = 0
    for df in ref_anchors:
        o = df.oct_scale
        if len(mine.get(o, [])) == 0:
            continue
        d = np.linalg.norm(mine[o] - np.asarray(df.coords, float), axis=1)
        if d.min() <= 1.5:
            matched += 1
    assert matched / len(ref_anchors) > 0.9, \
        f"only {matched}/{len(ref_anchors)} reference anchors matched"


@pytest.mark.parametrize("seed,patch,n_res", [
    (11, 16, 40),          # defaults
    (23, 16, 80),          # seed sweep (bigger protein: enough anchors for
                           # the statistical gate to be meaningful)
    (11, 12, 40),          # beta-galactosidase config (run_MaD.py:56-60)
    (11, 24, 80),          # GluK2 config (run_MaD.py:49-54); bigger protein
                           # so patch-radius-12 anchors stay interior
])
def test_orient_describe_parity_identical_inputs(refmod, make_tiny, seed,
                                                 patch, n_res):
    """Feed the reference Orientator/Descriptor the same gradient field and
    anchors as the mad_tpu kernels; (main, sec) lane sets and descriptor
    vectors must agree (mad/Orientator.py:68-110, mad/Descriptor.py:106-202).
    Swept over seeds and the reference's documented patch_size configs."""
    path, p = make_tiny(seed, n_res=n_res)
    from scipy.interpolate import RegularGridInterpolator as RGI
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.ops.scalespace import build_scale_space
    from mad_tpu.ops.detect import detect_anchors, Anchors
    from mad_tpu.ops.orient import orient_anchors
    from mad_tpu.ops.describe import describe_anchors
    from mad_tpu.core.config import MadConfig
    import jax.numpy as jnp

    cfg = MadConfig.from_run_kwargs(patch_size=patch)
    g = simulate_density(p, 8.0, 2.0, shape_bucket=1)
    ss = build_scale_space(g, cfg.scalespace, shape_bucket=1)
    octv = ss.octaves[1]                      # base octave, stride 1
    anch = detect_anchors(octv.log, octv.real_shape, cfg.detect)
    valid = np.asarray(anch.valid)
    coords = np.asarray(anch.coords)[valid][:16]
    nsel = len(coords)
    assert nsel > 0
    grad_np = np.asarray(octv.grad, dtype=np.float64)

    # --- reference path on identical inputs
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        ori = refmod["Orientator"](ori_radius=patch)
        dsc = refmod["Descriptor"](dsc_radius=patch)
    finally:
        os.chdir(cwd)
    dfs = []
    for i, c in enumerate(coords):
        df = refmod["DensityFeature"]()
        df.set_detector_info(i, 1, [int(c[0]), int(c[1]), int(c[2])],
                             np.asarray(c, float), np.asarray(c, float), 1.0)
        dfs.append(df)
    ms_fake = types.SimpleNamespace(
        grad_list=[None, grad_np],
        rgi_space=[None, RGI(
            points=[np.arange(s) for s in grad_np.shape[:3]],
            values=grad_np, method="nearest")],
        name="fake")
    ori.step1_reject = 0
    oriented = ori.assign_orientations(ms_fake, dfs)
    described = dsc.generate_descriptors(ms_fake, oriented)
    ref_lanes = {}
    for df in described:
        ref_lanes[(df.index, int(df.main_bin), int(df.sec_bin))] = \
            np.asarray(df.lin_ar_subeqsp)

    # --- mad_tpu path
    k = 128
    cpad = np.zeros((k, 3), np.int32)
    vpad = np.zeros(k, bool)
    cpad[:nsel] = coords
    vpad[:nsel] = True
    a2 = Anchors(coords=jnp.asarray(cpad),
                 subvox=jnp.asarray(cpad, jnp.float32),
                 values=jnp.zeros(k), valid=jnp.asarray(vpad))
    o2 = orient_anchors(jnp.asarray(grad_np, jnp.float32), a2,
                        octv.real_shape, upsampled=False, cfg=cfg.orient,
                        chunk=128)
    ok = np.asarray(o2.valid)
    K, M, S = ok.shape
    lanes = np.argwhere(ok)
    lane_coords = cpad[lanes[:, 0]]
    lane_rf = np.asarray(o2.rfinal)[lanes[:, 0], lanes[:, 1], lanes[:, 2]]
    ncap = ((len(lanes) + 127) // 128) * 128
    lc = np.zeros((ncap, 3), np.int32)
    lr = np.broadcast_to(np.eye(3, dtype=np.float32), (ncap, 3, 3)).copy()
    lv = np.zeros(ncap, bool)
    lc[: len(lanes)] = lane_coords
    lr[: len(lanes)] = lane_rf
    lv[: len(lanes)] = True
    descs, dok = describe_anchors(
        jnp.asarray(grad_np, jnp.float32), jnp.asarray(lc), jnp.asarray(lr),
        jnp.asarray(lv), octv.real_shape, upsampled=False, cfg=cfg.describe,
        chunk=128)
    descs = np.asarray(descs)

    my_lanes = {}
    for li, (ai, mi, si) in enumerate(lanes):
        key = (int(ai), int(np.asarray(o2.main_bin)[ai, mi]),
               int(np.asarray(o2.sec_bin)[ai, mi, si]))
        my_lanes[key] = descs[li]

    # Lane sets agree for the vast majority (quantization ties may flip
    # borderline candidates)
    common = set(ref_lanes) & set(my_lanes)
    union = set(ref_lanes) | set(my_lanes)
    assert union, "no lanes survived on either side"
    assert len(common) / len(union) > 0.9, \
        (len(common), len(ref_lanes), len(my_lanes))

    # Descriptors on common lanes are (near-)identical
    cos = []
    for key in common:
        a, b = ref_lanes[key].astype(float), my_lanes[key].astype(float)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            continue
        cos.append(a @ b / (na * nb))
    assert np.mean(cos) > 0.995, np.mean(cos)
