"""Pin the analytic matcher roofline (utils/roofline.py) to the kernel's
actual tile math and to hand-computed bound values (VERDICT r4 #4)."""

import numpy as np

from stereo_reconstruction_tpu.utils import roofline


def test_tiling_matches_kernel_derivation():
    # trainingQ / D=100 — the bench headline config
    r = roofline.matcher_roofline(375, 450, 100, 17)
    t = r["tiling"]
    # hand-derived from pallas_cost_volume._run with H=375, W=450, D=100
    assert t["H8"] == 47
    assert t["Wout"] == 512 and t["Wn"] == 1
    assert t["Wbw"] == 640
    assert t["Dc"] == 128 and t["Dp"] == 128
    # groups: d0 = 0,16,...,96 run (7); 112 >= D skipped
    assert t["n_groups"] == 7 and t["n_dslots"] == 112


def test_bounds_hand_values():
    r = roofline.matcher_roofline(375, 450, 100, 17)
    # MXU: horizontal 47 bands x 7 groups x 3 passes x 2*128*640*512
    assert r["mxu_flops"] == 47 * 7 * 3 * 2 * 128 * 640 * 512
    # HBM compulsory: 2 images f32 in + disparity out
    assert r["hbm_bytes_compulsory"] == 375 * 450 * 3 * 4 * 2 + 375 * 450 * 4
    # floors ordered on this config: hbm < vpu < mxu
    f = r["floor_ms"]
    assert f["hbm"] < f["vpu"] < f["mxu"]
    assert r["binding_resource"] == "mxu"
    assert 0.2 < r["floor_ms_binding"] < 1.0


def test_scaling_monotone():
    base = roofline.matcher_roofline(375, 450, 100)
    half = roofline.matcher_roofline(750, 900, 200)
    # 4x pixels x 2x disparities: every resource bound must grow
    for k in ("hbm_bytes_actual", "vpu_ops", "mxu_flops"):
        assert half[k] > 4 * base[k]


def test_report_gap():
    r = roofline.report(2.0, 375, 450, 100)
    assert np.isclose(
        r["gap_to_binding_bound"], 2.0 / r["floor_ms_binding"], rtol=0.01)
    assert 0 < r["pct_of_peak"]["mxu"] <= 100
