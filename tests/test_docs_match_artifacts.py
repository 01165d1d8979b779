"""Prose-vs-artifact consistency gate (VERDICT r4 #7).

README.md and PARITY.md quote the image-scale perceptual headline
(s/image and speedup-vs-oracle). Round 4 shipped docs quoting a
superseded run (3.75 s / 6,681x while the refreshed artifact said
4.87 s / 1,005x). This test parses the quoted numbers out of both docs
and compares them to baselines/perceptual_parity.json: quoted values
must be within 1.5x of the artifact (timing refreshes legitimately
drift; era-stale quotes and order-of-magnitude speedup errors fail).
"""

import json
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _artifact():
    path = os.path.join(ROOT, "baselines", "perceptual_parity.json")
    if not os.path.isfile(path):
        pytest.skip("perceptual_parity.json not generated")
    with open(path) as f:
        data = json.load(f)
    img = data.get("image_scale")
    if not img:
        pytest.skip("no image_scale record yet")
    return img


def _num(s):
    return float(s.replace(",", ""))


@pytest.mark.parametrize("doc", ["README.md", "PARITY.md"])
def test_quoted_perceptual_headline_tracks_artifact(doc):
    img = _artifact()
    with open(os.path.join(ROOT, doc)) as f:
        text = f.read()

    m = re.search(r"([\d.,]+)\s*s/image", text)
    assert m, f"{doc}: no 's/image' headline found"
    quoted_s = _num(m.group(1))
    actual_s = float(img["windowed_tpu_s"])
    assert actual_s / 1.5 <= quoted_s <= actual_s * 1.5, (
        f"{doc} quotes {quoted_s} s/image but the artifact records "
        f"{actual_s} — update the doc (or rerun tools/perceptual_scale.py)")

    m = re.search(r"([\d.,]+)×\s+the oracle|\(([\d.,]+)×\)", text)
    assert m, f"{doc}: no oracle-speedup quote found"
    quoted_x = _num(m.group(1) or m.group(2))
    actual_x = float(img["windowed_speedup_vs_oracle"])
    assert actual_x / 1.5 <= quoted_x <= actual_x * 1.5, (
        f"{doc} quotes {quoted_x}x vs oracle but the artifact records "
        f"{actual_x}")
