"""Docking e2e under the reference's documented non-default knob regimes.

The reference pins tuned parameters per experimental system class
(/root/reference/run_MaD.py:35-60, notebook cells 12-20): cc_threshold=0.5 /
n_samples=80 at 9 A, n_samples=100 at 10 A x6, patch_size=24 at 11.6 A,
n_samples=120 + patch_size=12 at 13 A — plus BASELINE.json config 5's
low-resolution dense sweep. Each regime here is a synthetic self-fit
(full rotation+translation decoy) at the matching resolution; recovery of
every copy under the regime's knobs is the acceptance bar (the reference's
own criterion is qualitative: "the expected model is built").

Results are also tabulated in PARITY.md via scripts/knob_matrix.py.
"""

import numpy as np
import pytest

from mad_tpu.testing import KNOB_REGIMES, run_knob_regime

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("regime", KNOB_REGIMES,
                         ids=[r["name"] for r in KNOB_REGIMES])
def test_knob_regime_recovers_all_copies(regime):
    res = run_knob_regime(regime)
    assert res["n_solutions"] >= res["n_copies"] // 2, res
    assert res["recovered"] == res["n_copies"], res
    # recovered copies localize well below the regime threshold
    good = [r for r in res["rmsds"] if r < res["threshold"]]
    assert np.median(good) < res["threshold"] / 2.0, res
