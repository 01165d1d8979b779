"""End-to-end quality regression against real GT (Teddy, trainingQ).

Teddy (scenario 13 — the reference main.cpp's canonical scene) ships with
real GT disparity + nocc masks in this checkout. The operative baseline
(BASELINE.md) is the reference pipeline's own output, reproduced by
tools/reference_baseline.py: bad-2.0 = 30.65%, avgErr = 2.31 at quarter
resolution (baselines/Teddy_ds1_baseline.json).

The framework must stay within 0.5pp of that — and currently beats it by
~14pp (bad-2.0 ~16%), so the gate also guards the improvement.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_reconstruction_tpu.config import PipelineConfig
from stereo_reconstruction_tpu.data import MiddEval3
from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
from stereo_reconstruction_tpu.pipeline import run_pair

BASELINE_BAD2 = 30.65           # reference pipeline output (baselines/)
BUDGET_PP = 0.5                 # BASELINE.json north-star tolerance


@pytest.mark.slow
def test_full_pipeline_beats_reference_baseline(middeval_root):
    pair = downsample_pair(MiddEval3(middeval_root).load_training(13))  # Teddy Q
    if pair.disp_right_gt is None:
        pytest.skip("Teddy GT not present in this checkout")

    cfg = PipelineConfig()
    cfg = cfg.replace(
        matcher=dataclasses.replace(cfg.matcher, max_disparity=100),
        recon=dataclasses.replace(cfg.recon, outlier_kernel=251),
    )
    res = run_pair(pair, cfg)

    assert res.pose is not None and bool(res.pose.valid)
    assert float(res.pose.reproj_error_ba) < 1.0

    bad2 = res.metrics["bad_percent"]
    assert bad2 <= BASELINE_BAD2 + BUDGET_PP, (
        f"bad-2.0 {bad2:.2f}% exceeds reference baseline "
        f"{BASELINE_BAD2}% + {BUDGET_PP}pp"
    )
    # guard the current margin (~16%) against silent regressions
    assert bad2 < 22.0, f"bad-2.0 {bad2:.2f}% regressed from ~16%"
    assert res.metrics["avg_err"] < 2.31 + 0.5
