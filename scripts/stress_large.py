"""Scale stress run: 16 subunits in a ~400-voxel-cube map.

Beyond the north-star size (BASELINE.md is 10 subunits / ~256^3): exercises
the memory-bounded scale space (streamed octaves, split log/grad programs,
bf16 gradients above the >250 M voxel gate) plus the rescue rounds on a
deliberately over-packed synthetic shell.

Usage: python scripts/stress_large.py [n_copies] [n_res] [spread]
Prints per-pass wall time, recovered-copy count and median best CA-RMSD.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_res = int(sys.argv[2]) if len(sys.argv) > 2 else 260
    spread = float(sys.argv[3]) if len(sys.argv) > 3 else 165.0

    import dataclasses
    from mad_tpu.core.config import MadConfig
    from mad_tpu.utils.warmup import replay

    cfg = MadConfig()
    # rescue rounds (opt-in capability) recover the marginal copies the
    # first-round budget misses on this over-packed shell
    cfg = cfg.replace(filter=dataclasses.replace(cfg.filter,
                                                 rescue_rounds=1))
    replay(block=False)
    t0 = time.time()
    sub, copies, dmap = bench.build_system(
        n_copies=n_copies, n_res=n_res, spread=spread, seed=1)
    print(f"stress> map {dmap.shape} ({np.prod(dmap.shape)/1e6:.0f} M vox) "
          f"built in {time.time() - t0:.1f}s", flush=True)

    for i in range(2):
        t0 = time.time()
        sols, n_models = bench.run_fit(sub, copies, dmap, 10.0, cfg)
        t = time.time() - t0
        rmsds = bench.accuracy(sols, copies)
        found = int(np.sum(np.asarray(rmsds) < 10.0))
        print(f"stress> pass {i}: {t:.1f}s, {len(sols)} solutions, "
              f"{n_models} models, {found}/{n_copies} recovered, "
              f"median best CA-RMSD {np.median(rmsds):.2f} A", flush=True)


if __name__ == "__main__":
    main()
