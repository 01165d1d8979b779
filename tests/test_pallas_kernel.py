"""Fused Pallas block-search kernel vs the literal reference oracle.

Runs in interpreter mode on CPU (the compiled kernel is exercised on real
TPU by bench.py / the driver).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_reconstruction_tpu.config import MatcherConfig
from stereo_reconstruction_tpu.ops.pallas_block_search import pallas_block_search_right
from stereo_reconstruction_tpu import oracle

from test_block_search import _random_stereo


@pytest.mark.slow
def test_pallas_matches_loop_oracle(rng):
    left, right = _random_stereo(rng, h=28, w=40, max_d=8)
    cfg = MatcherConfig(block_size=7, min_disparity=0, max_disparity=10,
                        smooth_factor=0.9, row_smooth_iters=2)
    got = np.asarray(
        pallas_block_search_right(
            jnp.asarray(left), jnp.asarray(right), cfg,
            tile_width=128, interpret=True,
        )
    )
    want = oracle.block_search_right_loop(
        left, right, block_size=7, min_disparity=0, max_disparity=10,
        smooth_factor=0.9,
    )
    agree = (got == want).mean()
    assert agree > 0.99, f"only {agree:.3%} agreement"


@pytest.mark.slow
def test_pallas_tile_boundaries(rng):
    """Two W-tiles: the cross-tile boundary handoff must keep agreement."""
    left, right = _random_stereo(rng, h=20, w=80, max_d=6)
    cfg = MatcherConfig(block_size=5, min_disparity=0, max_disparity=8,
                        smooth_factor=0.9, row_smooth_iters=2)
    got = np.asarray(
        pallas_block_search_right(
            jnp.asarray(left), jnp.asarray(right), cfg,
            tile_width=40, interpret=True,
        )
    )
    want = oracle.block_search_right_loop(
        left, right, block_size=5, min_disparity=0, max_disparity=8,
        smooth_factor=0.9,
    )
    agree = (got == want).mean()
    assert agree > 0.98, f"only {agree:.3%} agreement"
