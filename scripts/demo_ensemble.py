"""Ensemble conformer ranking demo (the reference's GroEL use case).

BASELINE.md: the reference docks a 14-copy GroEL ensemble of 7 conformers
and its score ranks the correct conformer (C5, 1.36 A) first
(notebook cells 24-27). Without that data, this demo builds the analogous
synthetic problem: a trimer map simulated from conformer 0, an ensemble
folder with the true conformer plus progressively deformed ones, docked via
the full MaD session; score_ensembles must rank conformer 0 first.
"""

import os
import sys
import tempfile

import numpy as np

from mad_tpu import MaD
from mad_tpu.core.grid import write_mrc
from mad_tpu.core.structure import write_pdb
from mad_tpu.ops.simulate import simulate_density
from mad_tpu.testing import deform_structure as deform, make_assembly




def main():
    root = tempfile.mkdtemp(prefix="ens_demo_")
    os.chdir(root)
    sub, copies = make_assembly(n_copies=3, n_res=90, seed=12, spread=26.0)
    coords = np.concatenate([c.coords for c in copies])
    masses = np.concatenate([c.masses for c in copies])
    dmap = simulate_density(coords, 8.0, 2.0, masses=masses)
    write_mrc(dmap, "map.mrc")

    ens = os.path.join(root, "conformers")
    os.makedirs(ens)
    write_pdb(copies[0], os.path.join(ens, "conf_0.pdb"))
    for i, scale in enumerate((5.0, 9.0, 14.0), start=1):
        write_pdb(deform(copies[0], scale, seed=i),
                  os.path.join(ens, f"conf_{i}.pdb"))

    mad = MaD(workdir=root)
    mad.add_map("map.mrc", resolution=8.0)
    mad.add_subunit(ens, n_copies=3, identifier="conformers")
    mad.run(transform_subunits=True)
    rankings = mad.score_ensembles()

    rows = rankings["conformers"]
    by_score = sorted(rows, key=lambda r: r[4], reverse=True)
    print("\n=== ensemble ranking (by RWmCC) ===")
    for k, rep, wgt, mcc, rwc in by_score:
        print(f"  {k}: R={rep:.1f} W={wgt:.1f} mCC={mcc:.3f} S={rwc:.1f}")
    best = by_score[0][0]
    print(f"\ntrue conformer ranked first: {best == 'conf_0'} ({best})")
    sys.exit(0 if best == "conf_0" else 1)


if __name__ == "__main__":
    main()
