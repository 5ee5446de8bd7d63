"""Run the reference's documented knob-regime matrix end-to-end and print
the PARITY.md results table (recovery rate + median RMSD per regime).

Regimes: mad_tpu.testing.KNOB_REGIMES (parity: /root/reference/run_MaD.py:
35-60 + BASELINE.json config 5). Usage: python scripts/knob_matrix.py
[--cpu] — on CPU this takes several minutes per regime.
"""

import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    from mad_tpu.testing import KNOB_REGIMES, run_knob_regime

    rows = []
    for regime in KNOB_REGIMES:
        t0 = time.time()
        res = run_knob_regime(regime)
        dt = time.time() - t0
        good = [r for r in res["rmsds"] if r < res["threshold"]]
        med = float(np.median(good)) if good else float("inf")
        rows.append((res["name"], regime["run_kwargs"],
                     f"{res['map_shape']}", res["recovered"],
                     res["n_copies"], med, res["n_solutions"], dt,
                     res["cite"]))
        print(f"knob> {res['name']}: {res['recovered']}/{res['n_copies']} "
              f"recovered, median CA-RMSD {med:.2f} A, "
              f"{res['n_solutions']} solutions, {dt:.0f}s", flush=True)

    print("\n| regime | knobs | map | recovered | median CA-RMSD (A) | "
          "reference |")
    print("|---|---|---|---|---|---|")
    for (name, kw, shape, rec, n, med, _nsol, _dt, cite) in rows:
        kws = ", ".join(f"{k}={v}" for k, v in kw.items())
        print(f"| {name} | {kws} | {shape} | {rec}/{n} | {med:.2f} | "
              f"{cite} |")


if __name__ == "__main__":
    main()
