"""Gate on the recorded config-3 perceptual quality report.

``tools/perceptual_parity.py`` scores BOTH perceptual backends against
the literal notebook-semantics oracle (identical VGG weights) on a real
Teddy crop and records ``baselines/perceptual_parity.json``:

  * ``windowed`` (production) — the notebook's per-window semantics as
    one device program; must track the oracle to f32 noise (VERDICT r2
    item 3 target: >=90% 2px, bad-2.0 within 0.5pp — the recorded run
    sits at ~100%);
  * ``full_image`` — the ~10x-cheaper structural approximation; bounded
    loosely and required to deliver its speedup.

The live exactness gate that doesn't depend on this artifact is
tests/test_perceptual.py::test_windowed_search_matches_notebook_oracle_exactly.
"""

import json
import os

import pytest

from conftest import warn_if_stale_baseline

PATH = os.path.join(os.path.dirname(__file__), "..", "baselines",
                    "perceptual_parity.json")


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(PATH):
        pytest.skip("perceptual parity report not generated "
                    "(run tools/perceptual_parity.py)")
    with open(PATH) as f:
        data = json.load(f)
    if "modes" not in data:
        pytest.skip("pre-windowed-mode report; regenerate")
    warn_if_stale_baseline(data, "perceptual_parity.json")
    return data


def test_windowed_tracks_notebook_oracle(report):
    w = report["modes"]["windowed"]
    assert w["agreement_2px_pct"] >= 90.0
    assert w["agreement_exact_pct"] >= 90.0
    assert w["mean_abs_diff_px"] <= 0.5


def test_windowed_gt_quality_matches_notebook(report):
    w = report["modes"]["windowed"]
    assert abs(w["bad2_vs_gt_ours_pct"]
               - report["bad2_vs_gt_notebook_pct"]) <= 0.5


def test_full_image_bounded(report):
    f = report["modes"]["full_image"]
    assert f["agreement_2px_pct"] >= 50.0
    assert (f["bad2_vs_gt_ours_pct"]
            <= report["bad2_vs_gt_notebook_pct"] + 6.0)


def test_full_image_speedup_is_the_point(report):
    f = report["modes"]["full_image"]
    assert report["runtime_notebook_s"] / f["runtime_ours_s"] >= 10.0
    # (the windowed mode's recorded CPU runtime is jit-compile-dominated
    # — one lax.scan tracing a VGG tower — and not gated; its target
    # hardware is the TPU MXU)
