"""Experimental-map realism e2e: full session -> assembly on a noisy,
offset, isovalue-clamped map behind a permuted-axes + nxstart MRC header.

The reference's primary use case is experimental EMDB maps
(/root/reference/run_MaD.py:6-60): real maps carry noise, a non-zero
background plateau, a recommended isovalue, and the MRC header zoo
(mad/Dmap.py:26-67 handles axis reordering and the nxstart-vs-origin
ambiguity; :50-67 clamps below the isovalue and max-normalizes). Round-3
coverage exercised the header zoo only at the reader-unit level and docked
clean simulated maps; this module docks through the full MaD session on a
synthetic map degraded to experimental-like statistics.
"""

import os
import struct

import numpy as np
import pytest

from mad_tpu.api import MaD
from mad_tpu.core.grid import read_map
from mad_tpu.core.structure import write_pdb, parse_pdb
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import make_assembly

pytestmark = pytest.mark.slow

NOISE_SIGMA = 0.05       # additive Gaussian noise, fraction of map max
BACKGROUND = 0.05        # constant background plateau, fraction of max
ISOVALUE = 0.16          # clamp level (> background + 2*noise sigma)


def _write_experimental_mrc(path, arr_xyz, voxsp, origin):
    """Permuted-axes (mapc/mapr/maps = 3/1/2) + nxstart-convention header —
    the awkward corner of the header zoo (mad/Dmap.py:26-43), which the
    reference crashes on via its voxsp/voxelsp typo (MapSpace.py:100)."""
    axis_order = (2, 0, 1)
    perm = list(axis_order)[::-1]
    raw = np.transpose(arr_xyz, np.argsort(perm))   # (ns, nr, nc)
    ns, nr, nc = raw.shape
    hdr = bytearray(1024)
    # reader convention: origin[i] = nstart_word[axis_order[i]] * voxsp
    # (core/grid._read_mrc), so the start words are the inverse permutation
    starts = [0, 0, 0]
    for i in range(3):
        starts[axis_order[i]] = int(round(origin[i] / voxsp))
    struct.pack_into("<10i", hdr, 0, nc, nr, ns, 2,
                     starts[0], starts[1], starts[2], nc, nr, ns)
    struct.pack_into("<3f", hdr, 40, nc * voxsp, nr * voxsp, ns * voxsp)
    struct.pack_into("<3f", hdr, 52, 90.0, 90.0, 90.0)
    struct.pack_into("<3i", hdr, 64, axis_order[0] + 1, axis_order[1] + 1,
                     axis_order[2] + 1)
    hdr[208:212] = b"MAP "
    hdr[212:216] = bytes([0x44, 0x44, 0, 0])
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        raw.astype(np.float32).tofile(fh)


@pytest.fixture(scope="module")
def noisy_system(tmp_path_factory):
    root = tmp_path_factory.mktemp("expmap")
    sub, copies = make_assembly(n_copies=3, n_res=110, seed=7, spread=26.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    clean = simulate_density(coords, 10.0, 2.5, masses=masses)
    data = np.asarray(clean.host(), dtype=np.float64)   # max-normalized (=1)

    rng = np.random.default_rng(21)
    noisy = (data + BACKGROUND
             + rng.normal(scale=NOISE_SIGMA, size=data.shape))
    # voxel grid must sit on integer multiples of voxsp for the nxstart
    # convention; simulate origins already do (ops/simulate lattice regs).
    origin = np.asarray(clean.origin, dtype=float)
    assert np.allclose(origin / clean.voxsp,
                       np.round(origin / clean.voxsp), atol=1e-4)
    map_path = str(root / "exp_like.mrc")
    _write_experimental_mrc(map_path, noisy.astype(np.float32),
                            clean.voxsp, origin)
    sub_path = str(root / "subunit.pdb")
    write_pdb(copies[0], sub_path)
    return root, map_path, sub_path, sub, copies, clean


def test_reader_recovers_geometry(noisy_system):
    root, map_path, sub_path, sub, copies, clean = noisy_system
    g = read_map(map_path, isovalue=ISOVALUE)
    assert g.data.shape == tuple(clean.shape)
    np.testing.assert_allclose(np.asarray(g.origin),
                               np.asarray(clean.origin), atol=1e-3)
    # isovalue clamp zeroed the background/noise floor, then max-normalize
    h = np.asarray(g.host())
    assert h.max() == pytest.approx(1.0, abs=1e-5)
    assert (h > 0).mean() < 0.5      # most of the box is cleared floor
    # density mass sits where the clean map put it
    clean_h = np.asarray(clean.host())
    olap = np.vdot(h, clean_h) / np.sqrt(np.vdot(h, h)
                                         * np.vdot(clean_h, clean_h))
    assert olap > 0.9


def test_noisy_session_recovers_assembly(noisy_system):
    root, map_path, sub_path, sub, copies, clean = noisy_system
    mad = MaD(workdir=str(root))
    mad.add_map(map_path, resolution=10.0, isovalue=ISOVALUE)
    mad.add_subunit(sub_path, n_copies=3)
    # reference-matrix knobs for a noisy intermediate-res system
    # (run_MaD.py:43-47: cc_threshold=0.5, n_samples=100)
    mad.run(transform_subunits=True, cc_threshold=0.5, n_samples=100)

    sols = mad.solutions["subunit"]
    assert len(sols) >= 3
    for c in copies:
        best = min(s.structure.rmsd_ca_with(c) for s in sols)
        assert best < 5.0, best

    mad.build_assembly()
    out = mad.out_folder
    models_dir = os.path.join(out, "assembly_models")
    models = [f for f in os.listdir(models_dir) if f.startswith("Model_")]
    assert models
    m1 = parse_pdb(os.path.join(models_dir, "Model_1.pdb"))
    # best model holds all three placements, each near a true pose
    assert m1.n_atoms == 3 * copies[0].n_atoms
    n = copies[0].n_atoms
    placed = [m1.coords[i * n:(i + 1) * n] for i in range(3)]
    for c in copies:
        ca = c.ca_idx
        best = min(np.sqrt(((p[ca] - c.coords[ca]) ** 2).sum(-1).mean())
                   for p in placed)
        assert best < 5.0, best
