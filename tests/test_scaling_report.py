"""Gate on the recorded scaling-efficiency report (SCALING.json).

The report is produced by ``tools/scaling_bench.py`` on the virtual
8-device CPU mesh (see its docstring for why sharding_efficiency —
T_unsharded / T_sharded on identical host resources — is the
transferable multi-chip quantity here). North star: >= 80% efficiency
on the parallel axes. Regenerate with:

    PYTHONPATH= python tools/scaling_bench.py --out SCALING.json
"""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(PATH):
        pytest.skip("SCALING.json not generated (run tools/scaling_bench.py)")
    with open(PATH) as f:
        data = json.load(f)
    from conftest import warn_if_stale_baseline

    warn_if_stale_baseline(data, "SCALING.json")
    return data


def test_matcher_data_axis_efficiency(report):
    for n, rec in report["data_axis"].items():
        if int(n) >= 2:
            assert rec["sharding_efficiency"] >= 0.8, (n, rec)


def test_matcher_tile_axis_efficiency(report):
    for n, rec in report["tile_axis"].items():
        if int(n) >= 2:
            assert rec["sharding_efficiency"] >= 0.8, (n, rec)


def test_distributed_ba_efficiency(report):
    for n, rec in report["ba"].items():
        if int(n) >= 2:
            assert rec["sharding_efficiency"] >= 0.8, (n, rec)


def test_distributed_multiview_ba_efficiency(report):
    for n, rec in report["ba_multiview"].items():
        if int(n) >= 2:
            assert rec["sharding_efficiency"] >= 0.8, (n, rec)


def test_workload_is_realistic(report):
    wl = report["workload"]
    assert wl["D"] >= 48 and wl["ba_points"] >= 8192
