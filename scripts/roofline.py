"""Roofline accounting for the bench-scale hot programs (verdict r4 #1).

For each program on the bench system (10 copies, ~256^3 map):
  * device+dispatch time: min over REPS timed calls, each fenced by
    block_until_ready (one relay round trip ~0.1 s rides on every number;
    the min is the reproducible floor);
  * XLA cost analysis (compiled.cost_analysis()): flops + bytes accessed;
  * % of v5e peaks: MXU 197 TFLOP/s bf16 / ~49 TFLOP/s f32, HBM 819 GB/s.

Writes a markdown table to stdout (pasted into STATUS.md). Diagnostic
only - not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_F32 = 49.2e12        # v5e MXU f32 (bf16 197 / 4)
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
REPS = 5


def timed(fn, args, label, rows, flops_scale=1.0):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    flops = bytes_acc = None
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0) * flops_scale
        bytes_acc = ca.get("bytes accessed", 0.0)
    except Exception as e:
        sys.stderr.write(f"cost_analysis failed for {label}: {e}\n")
    rows.append((label, best, flops, bytes_acc))
    f = f"{flops/1e9:.1f}" if flops else "?"
    b = f"{bytes_acc/1e9:.2f}" if bytes_acc else "?"
    sys.stderr.write(f"roofline> {label}: {best*1e3:.1f} ms, "
                     f"{f} GF, {b} GB\n")
    return out


def main():
    import jax
    from mad_tpu.core.config import MadConfig
    from mad_tpu.ops.scalespace import iter_lazy_octaves
    from mad_tpu.engine import pipeline as pl
    from bench import build_system

    cfg = MadConfig()
    # Staged AOT warm (same protocol as bench.py): map-build programs
    # first, then the whole manifest, so first-use compiles do not
    # serialize through the remote compile service.
    from mad_tpu.utils.warmup import replay
    replay(block=False, only=("simulate", "grid"))
    sub, copies, dmap = build_system()
    replay(block=False)
    sys.stderr.write(f"map {dmap.shape}\n")

    rows = []
    spec_k, lane_cap = pl._frames_adopt(
        f"bench_map|{tuple(dmap.shape)}", (512, 2048))
    sys.stderr.write(f"frames: spec_k={spec_k} lane_cap={lane_cap}\n")
    radius = (cfg.orient.patch_size - cfg.orient.patch_size % 2) // 2
    dsc_radius = (cfg.describe.patch_size - cfg.describe.patch_size % 2) // 2

    det = cfg.detect

    def approx(octv):
        from mad_tpu.ops.scalespace import use_approx_peaks
        return use_approx_peaks(octv.real_shape)

    oi = -1
    for origin, octv in iter_lazy_octaves(dmap, cfg.scalespace,
                                          cfg.shape_bucket):
        oi += 1
        dims_a, s_i, s_p, up_a, tr = octv._args
        fn = pl._compiled_octave_chain(
            tuple(dims_a), float(s_i), float(s_p), bool(up_a), float(tr),
            tuple(octv.real_shape), float(det.threshold_abs),
            int(det.exclude_border), float(det.max_offset),
            int(det.newton_iters), int(det.max_anchors), int(spec_k),
            int(radius), cfg.orient.eqsp_size, cfg.orient.max_main,
            cfg.orient.max_sec, float(cfg.orient.cutoff_magn),
            float(cfg.orient.gw_sig), cfg.describe.subeqsp_size,
            cfg.describe.subregions, float(cfg.describe.cutoff_magn),
            float(cfg.describe.zero_magn), int(lane_cap),
            dsc_radius=int(dsc_radius), approx_peaks=approx(octv))
        timed(fn, (octv._data,), f"map oct{oi} chain "
              f"{tuple(octv.real_shape)} up={bool(up_a)}", rows)
        del octv

    # Subunit describe chain (smaller volume, same programs).
    from mad_tpu.ops.simulate import simulate_density
    from mad_tpu.api import _decoy_transform
    moved = _decoy_transform(sub)
    sgrid = simulate_density(moved, 10.0, dmap.voxsp,
                             shape_bucket=cfg.shape_bucket)
    skey = f"bench_sub|{tuple(sgrid.shape)}"
    sk, sl = pl._frames_adopt(skey, (512, 2048))
    oi = -1
    for origin, octv in iter_lazy_octaves(sgrid, cfg.scalespace,
                                          cfg.shape_bucket):
        oi += 1
        dims_a, s_i, s_p, up_a, tr = octv._args
        fn = pl._compiled_octave_chain(
            tuple(dims_a), float(s_i), float(s_p), bool(up_a), float(tr),
            tuple(octv.real_shape), float(det.threshold_abs),
            int(det.exclude_border), float(det.max_offset),
            int(det.newton_iters), int(det.max_anchors), int(sk),
            int(radius), cfg.orient.eqsp_size, cfg.orient.max_main,
            cfg.orient.max_sec, float(cfg.orient.cutoff_magn),
            float(cfg.orient.gw_sig), cfg.describe.subeqsp_size,
            cfg.describe.subregions, float(cfg.describe.cutoff_magn),
            float(cfg.describe.zero_magn), int(sl),
            dsc_radius=int(dsc_radius))
        timed(fn, (octv._data,), f"sub oct{oi} chain "
              f"{tuple(octv.real_shape)} up={bool(up_a)}", rows)
        del octv

    print("\n| program | time (ms) | GFLOP | GB touched | TFLOP/s | GB/s | "
          "% MXU f32 | % HBM |")
    print("|---|---|---|---|---|---|---|---|")
    for label, t, flops, bytes_acc in rows:
        if flops is not None:
            tf = flops / t / 1e12
            gbs = bytes_acc / t / 1e9
            print(f"| {label} | {t*1e3:.1f} | {flops/1e9:.1f} | "
                  f"{bytes_acc/1e9:.2f} | {tf:.2f} | {gbs:.0f} | "
                  f"{100*flops/t/PEAK_F32:.1f}% | "
                  f"{100*bytes_acc/t/PEAK_HBM:.1f}% |")
        else:
            print(f"| {label} | {t*1e3:.1f} | ? | ? | ? | ? | ? | ? |")


if __name__ == "__main__":
    main()
