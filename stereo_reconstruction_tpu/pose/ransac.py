"""Parallel-hypothesis RANSAC for the eight-point solve.

The reference RANSAC (``src/PoseEstimation/eight_point.cpp:253-361``) is a
sequential point-swap refinement: sample 12 points, repeatedly replace the
single worst point, blacklist points that break cheirality, accept when all
per-point errors drop below 4 px. That control flow is hostile to TPUs.

TPU-native replacement with the same accept thresholds and support size:
draw K independent 12-point hypotheses, run the batched eight-point solve
on all of them at once (one vmapped SVD batch — MXU-friendly), score each
hypothesis by mean projected pixel error with cheirality masking, and pick
the best. With K=128 the sample diversity strictly dominates the
reference's <=100 sequential swaps in practice.

Acceptance semantics preserved:
  * a hypothesis is discarded if cheirality fails (reference throw ->
    validity mask);
  * "success" means all per-point errors < 4 px (error_threshold);
  * the returned hypothesis maximizes inliers (error < threshold over the
    *full* match set), tie-broken by mean sample error — a strictly
    stronger criterion than the reference's best-sample-error bookkeeping.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_reconstruction_tpu.config import RansacConfig
from stereo_reconstruction_tpu.ops import geometry as geo
from stereo_reconstruction_tpu.pose.eight_point import eight_point as _eight_point


class RansacResult(NamedTuple):
    rotation: jnp.ndarray       # (3, 3)
    translation: jnp.ndarray    # (3,)
    essential: jnp.ndarray      # (3, 3)
    pose: jnp.ndarray           # (4, 4)
    sample_indices: jnp.ndarray  # (sample_size,) winning sample
    inlier_count: jnp.ndarray   # () int
    mean_error: jnp.ndarray     # () mean px error over the winning sample
    success: jnp.ndarray        # () bool: all sample errors < threshold
    valid: jnp.ndarray          # () bool: at least one cheirality-valid hyp


@functools.partial(jax.jit, static_argnames=("config", "num_matches_valid"))
def ransac_eight_point(
    key: jax.Array,
    matches_left: jnp.ndarray,    # (3, N) homogeneous pixels
    matches_right: jnp.ndarray,   # (3, N)
    K_left: jnp.ndarray,
    K_right: jnp.ndarray,
    config: RansacConfig = RansacConfig(),
    num_matches_valid: int | None = None,
) -> RansacResult:
    n = matches_left.shape[-1]
    n_valid = n if num_matches_valid is None else num_matches_valid
    k = config.num_hypotheses
    s = config.sample_size

    # K independent samples of `s` distinct indices in [0, n_valid)
    keys = jax.random.split(key, k)
    def draw(subkey):
        perm = jax.random.permutation(subkey, n_valid)
        return perm[:s]
    samples = jax.vmap(draw)(keys)                       # (K, s)

    sl = jnp.take(matches_left, samples, axis=1)         # (3, K, s)
    sl = jnp.moveaxis(sl, 1, 0)                          # (K, 3, s)
    sr = jnp.moveaxis(jnp.take(matches_right, samples, axis=1), 1, 0)

    results = _eight_point(sl, sr, K_left, K_right)      # batched over K

    # score 1: per-sample projected pixel error (reference eight_point.cpp:282-287)
    proj = geo.project(K_right, results.points_right)    # (K, 3, s)
    sample_err = geo.pixel_error(proj, sr)               # (K, s)
    mean_err = jnp.mean(sample_err, axis=-1)
    all_below = jnp.all(sample_err < config.error_threshold, axis=-1)

    # score 2: full-set inliers under each hypothesis via depth triangulation
    def full_inliers(R, T):
        xl = geo.normalize_points(K_left, matches_left)
        xr = geo.normalize_points(K_right, matches_right)
        depths = geo.triangulate_depths(xl, xr, R, T)
        pts_left = xl * depths[None, :]
        pts_right = geo.transform(R, T, pts_left)
        projected = geo.project(K_right, pts_right)
        err = geo.pixel_error(projected, matches_right)
        ok = (err < config.error_threshold) & (depths > 0)
        ok = ok & (jnp.arange(n) < n_valid)
        return jnp.sum(ok)

    inliers = jax.vmap(full_inliers)(results.rotation, results.translation)
    inliers = jnp.where(results.valid, inliers, -1)

    # winner: most inliers; tie-break by lower mean sample error
    score = inliers.astype(jnp.float32) - 1e-6 * mean_err
    best = jnp.argmax(score)

    return RansacResult(
        rotation=results.rotation[best],
        translation=results.translation[best],
        essential=results.essential[best],
        pose=results.pose[best],
        sample_indices=samples[best],
        inlier_count=inliers[best],
        mean_error=mean_err[best],
        success=all_below[best] & results.valid[best],
        valid=jnp.any(results.valid),
    )
