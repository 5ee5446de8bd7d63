"""Time the REFERENCE pipeline on the benchmark system (CPU, pure NumPy).

Builds the same 10-subunit ~256^3 system as bench.py and runs the
reference's describe -> match -> filter -> refine chain on it, producing the
reference wall time that bench.py's vs_baseline can be compared against.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.compare_reference import install_shims, REF  # noqa: E402


def main():
    from bench import build_system
    from mad_tpu.core.structure import write_pdb
    from mad_tpu.core.grid import write_sit

    workdir = "/tmp/ref_bench"
    os.makedirs(workdir, exist_ok=True)
    sub, copies, dmap = build_system()
    print(f"system: map {dmap.shape}", flush=True)
    write_sit(dmap, os.path.join(workdir, "map.sit"))
    moved = sub.with_coords(sub.coords - sub.center() + [150.0, 0.0, 0.0])
    write_pdb(moved, os.path.join(workdir, "subunit.pdb"))

    install_shims()
    cwd = os.getcwd()
    os.chdir(REF)
    from mad.MapSpace import MapSpace
    from mad.Detector import Detector
    from mad.Orientator import Orientator
    from mad.Descriptor import Descriptor
    from mad import MaD as refMaD
    os.chdir(cwd)

    t0 = time.time()

    def describe_ref(path, res, voxsp):
        os.chdir(REF)
        try:
            ms = MapSpace(path, resolution=res, voxelsp=voxsp,
                          map_padding=9, sig_init=2, sig_presmooth=1)
            det, ori, dsc = Detector(), Orientator(ori_radius=16), \
                Descriptor(dsc_radius=16)
            ori.step1_reject = 0
            ms.build_space()
            t = time.time()
            anchors = det.find_anchors(ms)
            print(f"  detect: {len(anchors)} anchors "
                  f"({time.time() - t:.1f}s)", flush=True)
            t = time.time()
            oriented = ori.assign_orientations(ms, anchors)
            print(f"  orient: {len(oriented)} ({time.time() - t:.1f}s)",
                  flush=True)
            t = time.time()
            out = dsc.generate_descriptors(ms, oriented)
            print(f"  describe: ({time.time() - t:.1f}s)", flush=True)
            return out
        finally:
            os.chdir(cwd)

    map_dsc = describe_ref(os.path.join(workdir, "map.sit"), 10.0, dmap.voxsp)
    t_map = time.time() - t0
    print(f"reference describe(map): {t_map:.1f}s", flush=True)
    sub_dsc = describe_ref(os.path.join(workdir, "subunit.pdb"), 10.0,
                           dmap.voxsp)
    print(f"reference describe(sub): {time.time() - t0 - t_map:.1f}s",
          flush=True)

    mad = refMaD.MaD()
    mad.resolution = 10.0
    mad.voxsp = dmap.voxsp
    mad.processed_map = os.path.join(workdir, "map.sit")
    t1 = time.time()
    match_results, lo_anchors, hi_anchors = mad._match_dsc(
        map_dsc, sub_dsc, cc_threshold=0.6)
    print(f"reference match: {len(match_results)} pairs "
          f"({time.time() - t1:.1f}s)", flush=True)
    t1 = time.time()
    filtered = mad._filter_dsc_pairs(
        os.path.join(workdir, "subunit.pdb"), match_results, lo_anchors,
        hi_anchors, wthresh=4, n_samples=600)
    print(f"reference filter: {len(filtered)} candidates "
          f"({time.time() - t1:.1f}s)", flush=True)
    t1 = time.time()
    refined = mad._refine_filtered_solutions(
        os.path.join(workdir, "subunit.pdb"), filtered, lo_anchors,
        hi_anchors)
    print(f"reference refine+score: {len(refined)} solutions "
          f"({time.time() - t1:.1f}s)", flush=True)
    total = time.time() - t0
    print(f"REFERENCE TOTAL (describe+dock, no assembly): {total:.1f}s",
          flush=True)
    rmsds = []
    for c in copies:
        best = np.inf
        for sol in refined:
            pdb = sol[0]
            d = np.square(pdb.coords[list(pdb.CA_idx)] - c.coords[c.ca_idx])
            best = min(best, float(np.sqrt(d.sum() / d.shape[0])))
        rmsds.append(best)
    found = sum(1 for r in rmsds if r < 10)
    print(f"reference accuracy: {found}/10 recovered, "
          f"median {np.median(rmsds):.2f} A", flush=True)


if __name__ == "__main__":
    main()
