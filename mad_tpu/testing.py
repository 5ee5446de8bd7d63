"""Synthetic structure generators for tests and benchmarks.

The reference validates against EMDB/PDB files that are not shipped with the
repository, so tests and benchmarks here build procedural pseudo-proteins
(ideal alpha-helix backbones bent by a random walk) with realistic atom
counts, masses and CA/backbone markup.

``KNOB_REGIMES`` mirrors the reference's documented non-default parameter
matrix (/root/reference/run_MaD.py:35-60, notebook cells 12-20): each row is
a tuned regime the reference pins for a specific experimental system class,
re-created here on synthetic assemblies at the matching resolution so the
docking e2e behavior under those knobs is covered (tests/test_knob_matrix.py,
scripts/knob_matrix.py -> PARITY.md).
"""

from __future__ import annotations

import numpy as np

from .core.structure import ATOMIC_MASS, Structure

# Ideal helix parameters: rise 1.5 A / residue, 100 deg twist, radius 2.3 A.
_HELIX_RISE = 1.5
_HELIX_TWIST = np.deg2rad(100.0)
_HELIX_RADIUS = 2.3


def make_protein(n_res: int = 120, seed: int = 0, n_segments: int = 4
                 ) -> Structure:
    """Pseudo-protein: n_segments helical segments with random orientations.

    Backbone atoms (N, CA, C, O) per residue -> 4*n_res atoms.
    """
    rng = np.random.default_rng(seed)
    res_per_seg = max(4, n_res // n_segments)
    coords = []
    origin = np.zeros(3)
    for s in range(n_segments):
        # Random segment direction, mild continuation bias.
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        # Build helix along +z then rotate onto d.
        t = np.arange(res_per_seg) * _HELIX_TWIST
        z = np.arange(res_per_seg) * _HELIX_RISE
        ca = np.stack([_HELIX_RADIUS * np.cos(t),
                       _HELIX_RADIUS * np.sin(t), z], axis=-1)
        axis = np.cross([0.0, 0.0, 1.0], d)
        na = np.linalg.norm(axis)
        if na > 1e-8:
            axis = axis / na
            ang = np.arccos(np.clip(d[2], -1, 1))
            K = np.array([[0, -axis[2], axis[1]],
                          [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]])
            R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        else:
            R = np.eye(3)
        ca = ca @ R.T + origin
        origin = ca[-1] + d * 3.0
        for c in ca:
            jitter = rng.normal(scale=0.3, size=(3, 3))
            coords.append(("N", c + np.array([-1.3, 0.2, -0.6]) + jitter[0]))
            coords.append(("CA", c))
            coords.append(("C", c + np.array([1.2, 0.4, 0.5]) + jitter[1]))
            coords.append(("O", c + np.array([1.6, 1.4, 0.3]) + jitter[2]))

    names = [n for n, _ in coords]
    xyz = np.array([p for _, p in coords], dtype=np.float64)
    elems = [n[0] for n in names]
    masses = np.array([ATOMIC_MASS[e] for e in elems], dtype=np.float32)
    ca_idx = np.array([i for i, n in enumerate(names) if n == "CA"])
    bb_idx = np.arange(len(names))
    info = [[i + 1, n, "ALA", "A", i // 4 + 1, n[0], "ATOM"]
            for i, n in enumerate(names)]
    return Structure(coords=xyz, masses=masses, ca_idx=ca_idx, bb_idx=bb_idx,
                     info=info, source=f"synthetic_seed{seed}")


def make_assembly(n_copies: int = 3, n_res: int = 100, seed: int = 0,
                  spread: float = 28.0, shell: bool = False):
    """One subunit replicated at n_copies random poses -> (subunit, copies).

    Poses sit on a ring (default) or a Fibonacci spherical shell
    (shell=True, fills a 3D volume) so copies touch but do not overlap,
    mimicking a homomultimer assembly.
    """
    rng = np.random.default_rng(seed)
    sub = make_protein(n_res=n_res, seed=seed)
    sub = sub.with_coords(sub.coords - sub.center())
    copies = []
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(n_copies):
        # Rotate each copy by a distinct random rotation.
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        if shell:
            zc = 1.0 - 2.0 * (i + 0.5) / n_copies
            r = np.sqrt(max(0.0, 1.0 - zc * zc))
            ang = golden * i
            t = spread * np.array([r * np.cos(ang), r * np.sin(ang), zc])
        else:
            ang = 2 * np.pi * i / n_copies
            t = spread * np.array([np.cos(ang), np.sin(ang),
                                   0.1 * rng.normal()])
        copies.append(sub.transformed(R, t))
    return sub, copies


# Reference knob matrix (mad run_MaD.py:35-60 + BASELINE.json config 5).
# Each entry: (name, reference citation, system params, run() kwargs).
# System params pick a synthetic assembly whose subunit size / map scale
# matches the documented regime's resolution class; voxel spacing scales
# with resolution (the information content per voxel is what the knobs
# respond to, not absolute Angstroms).
KNOB_REGIMES = [
    dict(name="9A_cc05_ns80",
         cite="run_MaD.py:35-41 (microtubule+kinesin, EMD-1340, 9 A)",
         resolution=9.0, voxsp=2.25, n_copies=3, n_res=140, spread=26.0,
         seed=11, run_kwargs=dict(cc_threshold=0.5, n_samples=80)),
    dict(name="10A_cc05_ns100_x6",
         cite="run_MaD.py:43-47 (MecA-ClpC, EMD-5609, 10 A, x6)",
         resolution=10.0, voxsp=2.5, n_copies=6, n_res=150, spread=40.0,
         seed=12, run_kwargs=dict(cc_threshold=0.5, n_samples=100)),
    dict(name="11.6A_patch24",
         cite="run_MaD.py:49-54 (GluK2, EMD-8290, 11.6 A, 2x2)",
         resolution=11.6, voxsp=2.9, n_copies=4, n_res=220, spread=34.0,
         seed=13, run_kwargs=dict(patch_size=24)),
    dict(name="13A_ns120_patch12",
         cite="run_MaD.py:56-60 (beta-galactosidase, EMD-2548, 13 A, x4)",
         resolution=13.0, voxsp=3.0, n_copies=4, n_res=260, spread=36.0,
         seed=14, run_kwargs=dict(n_samples=120, patch_size=12)),
    dict(name="18A_dense_sweep",
         cite="BASELINE.json config 5 (low-res 15-20 A dense sweep)",
         # spread must exceed the subunit diameter at this blur level or
         # neighboring copies' densities merge (tuned: 40 -> 1/3, 62 -> 3/3)
         resolution=18.0, voxsp=3.6, n_copies=3, n_res=340, spread=62.0,
         seed=15, run_kwargs=dict(cc_threshold=0.5, n_samples=120)),
]


def run_knob_regime(regime: dict, rescue_rounds: int = 0):
    """Dock one KNOB_REGIMES entry end-to-end (self-fit decoy protocol with
    the full rotation+translation decoy). Returns a result dict with per-copy
    best CA-RMSDs, recovery count and solution count."""
    import dataclasses

    from .core.config import MadConfig
    from .engine.docking import dock_structure
    from .engine.pipeline import describe_grid, describe_structure
    from .ops.simulate import simulate_density

    cfg = MadConfig.from_run_kwargs(**regime["run_kwargs"])
    cfg = cfg.replace(
        detect=dataclasses.replace(cfg.detect, max_anchors=2048),
        filter=dataclasses.replace(cfg.filter,
                                   rescue_rounds=rescue_rounds,
                                   n_samples=cfg.filter.n_samples))
    sub, copies = make_assembly(n_copies=regime["n_copies"],
                                n_res=regime["n_res"], seed=regime["seed"],
                                spread=regime["spread"],
                                shell=regime["n_copies"] > 4)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, regime["resolution"], regime["voxsp"],
                            masses=masses).reduce_void()

    from .api import _decoy_transform
    moved = _decoy_transform(sub)
    map_set = describe_grid(dmap, cfg, name=f"knob_{regime['name']}_map")
    sub_set = describe_structure(moved, regime["resolution"], dmap.voxsp,
                                 cfg, name=f"knob_{regime['name']}_sub")
    sols = dock_structure(map_set, sub_set, moved, dmap,
                          regime["resolution"], cfg,
                          n_copies=regime["n_copies"], verbose=False)
    rmsds = [min((s.structure.rmsd_ca_with(c) for s in sols),
                 default=np.inf) for c in copies]
    thresh = max(4.0, regime["resolution"] / 2.0)
    return dict(name=regime["name"], cite=regime["cite"],
                map_shape=tuple(dmap.shape), n_solutions=len(sols),
                rmsds=rmsds, threshold=thresh,
                recovered=int(np.sum(np.asarray(rmsds) < thresh)),
                n_copies=regime["n_copies"])
