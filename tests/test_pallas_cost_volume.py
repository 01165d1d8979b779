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
    """End-to-end: block_search_right with backend='pallas' (interpret on
    CPU) reproduces the sequential reference recurrence."""
    left, right = _random_stereo(rng, h=28, w=40, max_d=8)
    cfg = MatcherConfig(block_size=7, min_disparity=0, max_disparity=10,
                        smooth_factor=0.9, row_smooth_iters=2,
                        backend="pallas")
    import stereo_reconstruction_tpu.ops.pallas_cost_volume as pcv
    import functools

    # route the backend through interpret mode for the CPU test
    orig = pcv.pallas_cost_volume_right_ssd
    block_search.pcv.pallas_cost_volume_right_ssd = functools.partial(
        orig, interpret=True
    )
    try:
        got = np.asarray(
            block_search.block_search_right.__wrapped__(
                jnp.asarray(left), jnp.asarray(right), cfg
            )
        )
    finally:
        block_search.pcv.pallas_cost_volume_right_ssd = orig
    want = oracle.block_search_right_loop(
        left, right, block_size=7, min_disparity=0, max_disparity=10,
        smooth_factor=0.9,
    )
    agree = (got == want).mean()
    assert agree > 0.99, f"only {agree:.3%} agreement"
