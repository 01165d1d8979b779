"""Band-parallel Pallas cost-volume kernel vs the XLA path and the
literal reference-semantics oracle.

Runs in interpreter mode on CPU (the Mosaic-compiled kernel is exercised
on real TPU by bench.py's quality guard and tools/tpu_validate.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_reconstruction_tpu import oracle
from stereo_reconstruction_tpu.config import MatcherConfig
from stereo_reconstruction_tpu.ops import block_search, cost_volume as cv
from stereo_reconstruction_tpu.ops.pallas_cost_volume import pallas_cost_volume_right_ssd

from test_block_search import _random_stereo


@pytest.mark.slow
def test_pallas_cost_volume_matches_oracle(rng):
    left, right = _random_stereo(rng, h=24, w=32, max_d=8)
    want = oracle.cost_volume_right(
        left, right, block_size=7, min_disparity=0, max_disparity=10
    )
    got = np.asarray(
        pallas_cost_volume_right_ssd(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            block_size=7, min_disparity=0, max_disparity=10, interpret=True,
        )
    )
    got_hwd = np.moveaxis(got, 0, -1)
    np.testing.assert_array_equal(np.isinf(got_hwd), np.isinf(want))
    finite = np.isfinite(want)
    np.testing.assert_allclose(got_hwd[finite], want[finite], rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_pallas_cost_volume_matches_xla_path(rng):
    """Bit-level agreement with cost_volume_right_ssd incl. min_disparity,
    unequal widths (left wider), and non-multiple-of-8 heights."""
    left, right = _random_stereo(rng, h=21, w=40, max_d=8)
    left = np.pad(left, ((0, 0), (0, 9), (0, 0)))  # w_l > w_r
    want = np.asarray(
        cv.cost_volume_right_ssd(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            block_size=5, min_disparity=2, max_disparity=12,
        )
    )
    got = np.asarray(
        pallas_cost_volume_right_ssd(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            block_size=5, min_disparity=2, max_disparity=12, interpret=True,
        )
    )
    np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-6, atol=1e-5)


@pytest.mark.slow
def test_block_search_pallas_backend_matches_loop_oracle(rng):
    """End-to-end: block_search_right with backend='pallas' — the fused
    matcher-inputs kernel (interpret on CPU) — reproduces the sequential
    reference recurrence."""
    left, right = _random_stereo(rng, h=28, w=40, max_d=8)
    cfg = MatcherConfig(block_size=7, min_disparity=0, max_disparity=10,
                        smooth_factor=0.9, row_smooth_iters=2,
                        backend="pallas")
    import stereo_reconstruction_tpu.ops.pallas_cost_volume as pcv
    import functools

    # route the backend through interpret mode for the CPU test
    orig = pcv.pallas_matcher_inputs
    block_search.pcv.pallas_matcher_inputs = functools.partial(
        orig, interpret=True
    )
    try:
        got = np.asarray(
            block_search.block_search_right.__wrapped__(
                jnp.asarray(left), jnp.asarray(right), cfg
            )
        )
    finally:
        block_search.pcv.pallas_matcher_inputs = orig
    want = oracle.block_search_right_loop(
        left, right, block_size=7, min_disparity=0, max_disparity=10,
        smooth_factor=0.9,
    )
    agree = (got == want).mean()
    assert agree > 0.99, f"only {agree:.3%} agreement"


@pytest.mark.slow
@pytest.mark.parametrize("min_d,max_d,bs", [(0, 10, 7), (2, 12, 5)])
def test_pallas_matcher_inputs_match_volume_reductions(rng, min_d, max_d, bs):
    """The fused kernel's five smoothing-scan inputs == the same
    reductions computed from the full cost volume (bit-level)."""
    from stereo_reconstruction_tpu.ops.pallas_cost_volume import (
        pallas_matcher_inputs,
    )

    left, right = _random_stereo(rng, h=21, w=40, max_d=8)
    left = np.pad(left, ((0, 0), (0, 9), (0, 0)))
    cost = np.asarray(
        cv.cost_volume_right_ssd(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            block_size=bs, min_disparity=min_d, max_disparity=max_d,
        )
    )
    D, h, w = cost.shape
    m0, a0, cz, du, dl = (
        np.asarray(x) for x in pallas_matcher_inputs(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            block_size=bs, min_disparity=min_d, max_disparity=max_d,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(m0, cost.min(axis=0))
    np.testing.assert_array_equal(a0, cost.argmin(axis=0))
    i_zero = -min_d
    want_cz = cost[i_zero] if 0 <= i_zero < D else np.full((h, w), np.inf)
    np.testing.assert_array_equal(cz, want_cz)
    want_du = np.full((h, w), np.inf, np.float32)
    want_dl = np.full((h, w), np.inf, np.float32)
    for x in range(w):
        if 0 <= x - min_d < D:
            want_du[:, x] = cost[x - min_d, :, x]
        if 0 <= x - 1 - min_d < D:
            want_dl[:, x] = cost[x - 1 - min_d, :, x]
    np.testing.assert_array_equal(du, want_du)
    np.testing.assert_array_equal(dl, want_dl)
