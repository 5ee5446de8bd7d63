"""Per-stage device timing of the describe chain at bench scale.

Runs the SPLIT describe path (log_detect / grad / orient / describe as
separate programs) with an explicit device pull after each stage, so each
stage's wall time is its device execution + one relay round trip. Compares
against the fused whole-octave chain's end-to-end time. Diagnostic only —
not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax
    return jax.device_get(x)


def main():
    import jax
    from mad_tpu.core.config import MadConfig
    from mad_tpu.ops.scalespace import iter_lazy_octaves
    from mad_tpu.ops.orient import _compiled_orient
    from mad_tpu.ops.describe import describe_anchors
    from mad_tpu.engine import pipeline as pl
    from bench import build_system

    cfg = MadConfig()
    from mad_tpu.utils.warmup import replay
    replay(block=False, only=("simulate", "grid"))
    sub, copies, dmap = build_system()
    replay(block=False)
    print(f"map {dmap.shape}", flush=True)

    spec_k, lane_cap = pl._frames_adopt(
        f"bench_map|{tuple(dmap.shape)}", (512, 2048))
    print(f"frames: spec_k={spec_k} lane_cap={lane_cap}", flush=True)
    radius = (cfg.orient.patch_size - cfg.orient.patch_size % 2) // 2

    for rep in range(3):
        gen = iter_lazy_octaves(dmap, cfg.scalespace, cfg.shape_bucket)
        oi = -1
        t_all = time.time()
        for origin, octv in gen:
            oi += 1
            upsampled = octv.voxsp < dmap.voxsp
            t0 = time.time()
            (coords_c, valid_c, order_a, subvox, n_anch_d,
             _guard) = octv.log_detect(cfg.detect, spec_k)
            sync(n_anch_d)
            t1 = time.time()
            grad_vol = octv.grad()
            sync(grad_vol[0, 0, 0])
            t2 = time.time()
            stride = 2 if upsampled else 1
            ofn = _compiled_orient(
                tuple(grad_vol.shape[:3]), tuple(octv.real_shape), stride,
                radius, cfg.orient.eqsp_size, cfg.orient.max_main,
                cfg.orient.max_sec, float(cfg.orient.cutoff_magn),
                float(cfg.orient.gw_sig), 128, lane_cap=lane_cap)
            out = ofn(grad_vol, coords_c, valid_c)
            sync(out[-1])
            t3 = time.time()
            descs, ok = describe_anchors(
                grad_vol, out[7], out[2], out[3], octv.real_shape,
                upsampled, cfg.describe)
            sync(ok[0])
            t4 = time.time()
            print(f"  pass{rep} oct{oi} {tuple(octv.real_shape)}: "
                  f"log+detect {t1-t0:.3f}s grad {t2-t1:.3f}s "
                  f"orient {t3-t2:.3f}s describe {t4-t3:.3f}s", flush=True)
            del octv, grad_vol, out, descs
        print(f"  pass{rep} split total {time.time()-t_all:.3f}s",
              flush=True)

    # Fused chain for comparison.
    for rep in range(3):
        t0 = time.time()
        ds = pl.describe_grid(dmap, cfg, name="bench_map")
        t1 = time.time()
        print(f"fused pass{rep}: {t1-t0:.3f}s ({ds.n} rows)", flush=True)


if __name__ == "__main__":
    main()
