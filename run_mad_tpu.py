"""Canonical usage driver (parity with the reference's run_MaD.py).

The documented experimental configurations from the reference
(run_MaD.py:6-60) translate 1:1 — same knob names, same defaults:

    # 6dbl, 5 A
    mad.add_map("experimental_data/6dbl/emd_7845_processed.mrc", 5)
    mad.add_subunit("experimental_data/6dbl/6dbl_subA.pdb", n_copies=1)
    mad.add_subunit("experimental_data/6dbl/6dbl_subB.pdb", n_copies=2)
    mad.add_subunit("experimental_data/6dbl/6dbl_subC.pdb", n_copies=1)
    mad.run(); mad.build_assembly()

    # 2p4n, 9 A:  mad.run(cc_threshold=0.5, n_samples=80)
    # 3j3u, 10 A: mad.run(n_samples=100, cc_threshold=0.5)
    # 5kuh, 11.6 A: mad.run(patch_size=24)
    # 4ckd, 13 A: mad.run(n_samples=120, patch_size=12)

Without the (unshipped) experimental data, this driver demonstrates the
full pipeline on a synthetic self-fit assembly: simulate a trimer map,
decoy-transform the subunit, dock it back and build assembly models.
"""

from mad_tpu.demo import main

if __name__ == "__main__":
    # in-place like the reference driver (artifacts in the CWD); the
    # installed `mad-tpu-demo` console script defaults to a tempdir
    main(workdir=".")
