"""End-to-end uncalibrated pipeline (reference rectification_main.cpp):
ORB detect -> Hamming match -> F-RANSAC -> Loop-Zhang rectify -> linear
search -> F re-estimation + epiline artifacts.
"""

import os

import numpy as np

from stereo_reconstruction_tpu.config import MatcherConfig, OrbConfig, PipelineConfig
from stereo_reconstruction_tpu.pipeline_uncalibrated import run_uncalibrated


def _pair(dx=6):
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (176, 240)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), ax, base)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    return base[16:144, 16:200], base[16:144, 16 + dx : 200 + dx]


def test_uncalibrated_end_to_end(tmp_path):
    L, R = _pair()
    cfg = PipelineConfig(
        matcher=MatcherConfig(max_disparity=16),
        orb=OrbConfig(max_keypoints=256, num_levels=2),
    )
    out = str(tmp_path / "uncal")
    res = run_uncalibrated(L, R, cfg, output_dir=out)

    assert res.num_inliers >= 50
    assert res.F_rectified is not None
    # x'^T F x ~ 0 for a shifted pair: F maps shifted matches consistently
    assert np.isfinite(res.F).all()
    # artifacts written (rectification_main.cpp:204-214)
    for name in ("rectified_left.png", "rectified_right.png",
                 "disparity_linear.png"):
        assert os.path.exists(os.path.join(out, name))
    assert res.disparity.ndim == 2 and np.isfinite(res.disparity).all()
    # NB: a purely-shifted flat pair is a degenerate configuration for F
    # (any epipole on the x-axis fits), so no assertion on F's exact form —
    # the matched points satisfying x'^T F x = 0 is checked by RANSAC's
    # inlier count above.
