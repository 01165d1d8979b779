"""Gate on the recorded BASELINE config-4 full-resolution run.

``tools/config4_fullres.py`` matches a trainingF-sized pair (1984x2872,
D=400 sharded / D=256 single-chip) and records agreement against the
unsharded run and the exact reference-semantics oracle in
``baselines/config4_fullres.json``. This test pins the recorded
evidence: shapes at full scale, and parity ~1.
"""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(__file__), "..", "baselines",
                    "config4_fullres.json")


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(PATH):
        pytest.skip("config4 report not generated "
                    "(run tools/config4_fullres.py)")
    with open(PATH) as f:
        data = json.load(f)
    from conftest import warn_if_stale_baseline

    warn_if_stale_baseline(data, "config4_fullres.json")
    return data


def test_cpu_virtual_mesh_fullres(report):
    rec = report["cpu_virtual_mesh"]
    h, w = map(int, rec["image"].split("x"))
    assert h >= 1500 and w >= 2000 and rec["D"] >= 256
    assert rec["n_tiles"] >= 8
    # sharded tile program must agree with the unsharded full volume
    assert rec["sharded_vs_unsharded_agreement"] >= 0.999
    # and both must reproduce the reference-semantics oracle
    assert rec["unsharded_vs_oracle_agreement"] >= 0.999
    assert rec["sharded_vs_oracle_agreement"] >= 0.999


def test_hbm_budget_math(report):
    rec = report["cpu_virtual_mesh"]
    # the full volume exceeds a single v5e HBM headroom at D=400;
    # the per-shard block is what must (and does) fit
    assert rec["full_volume_gib"] > 8.0
    assert rec["per_shard_cost_block_gib"] < 2.0


def test_tpu_single_chip_fullres(report):
    if "tpu_single_chip" not in report:
        pytest.skip("tpu mode not recorded")
    rec = report["tpu_single_chip"]
    h, w = map(int, rec["image"].split("x"))
    assert h >= 1500 and w >= 2000 and rec["D"] >= 256
    # 2x-nearest-upsampled inputs tie adjacent disparities exactly, and
    # f32 summation order flips such ties — so gate exact agreement
    # loosely and the disparity-error view tightly
    assert rec["oracle_agreement_crop"] >= 0.99
    assert rec["oracle_within_2px_crop"] >= 0.999
