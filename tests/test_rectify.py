"""Rectification tests.

The decisive property of Loop-Zhang rectification: after applying the two
homographies, corresponding points lie on the same image row (epipolar
lines horizontal and aligned). The warp op is cross-validated against
OpenCV's warpPerspective (cv2 is available in the test image only as an
oracle — the framework itself never imports it).
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_reconstruction_tpu.ops import geometry as geo
from stereo_reconstruction_tpu.ops.warp import transform_points, warp_perspective
from stereo_reconstruction_tpu.rectify import (
    disparity_to_original_frame,
    loop_zhang_homographies,
    rectify_pair,
)


def _synthetic_F(rng, w=320, h=240):
    """F from a known stereo geometry + projected match points."""
    K = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]], np.float64)
    R = np.asarray(geo.angle_axis_to_rotation(jnp.asarray([0.02, -0.08, 0.01])), np.float64)
    T = np.array([-1.0, 0.05, 0.15])
    T /= np.linalg.norm(T)
    E = np.asarray(geo.skew(jnp.asarray(T))) @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    F /= np.linalg.norm(F)

    n = 40
    depths = rng.uniform(4, 10, n)
    xl = np.concatenate([rng.uniform(-0.3, 0.3, (2, n)), np.ones((1, n))])
    pts = xl * depths
    pts_r = R @ pts + T[:, None]
    kp_l = (K @ (pts / pts[2:3]))[:2]
    kp_r = (K @ (pts_r / pts_r[2:3]))[:2]
    inside = (
        (kp_l[0] >= 0) & (kp_l[0] < w) & (kp_l[1] >= 0) & (kp_l[1] < h)
        & (kp_r[0] >= 0) & (kp_r[0] < w) & (kp_r[1] >= 0) & (kp_r[1] < h)
    )
    return F, kp_l[:, inside], kp_r[:, inside], (h, w)


def test_epipolar_alignment_after_rectification(rng):
    F, kp_l, kp_r, (h, w) = _synthetic_F(rng)
    homs = loop_zhang_homographies(F, (h, w), (h, w))

    tl = np.asarray(transform_points(jnp.asarray(homs.H_left, jnp.float32), jnp.asarray(kp_l, jnp.float32)))
    tr = np.asarray(transform_points(jnp.asarray(homs.H_right, jnp.float32), jnp.asarray(kp_r, jnp.float32)))

    dy = np.abs(tl[1] - tr[1])
    # matched rows must align to ~subpixel scale relative to canvas height
    assert np.median(dy) < 1.5, f"median row misalignment {np.median(dy):.2f}px"
    assert np.percentile(dy, 90) < 3.0


def test_rectified_epipole_at_infinity(rng):
    """The left homography must send the epipole to infinity (third
    homogeneous coordinate ~ 0 relative to the others)."""
    F, _, _, (h, w) = _synthetic_F(rng)
    homs = loop_zhang_homographies(F, (h, w), (h, w))
    e = homs.epipole / np.linalg.norm(homs.epipole)
    mapped = homs.H_left @ e
    assert abs(mapped[2]) < 1e-3 * np.linalg.norm(mapped[:2])


def test_warp_matches_opencv_bilinear(rng):
    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    H = np.array([[1.05, 0.1, 3.0], [-0.08, 0.98, 2.0], [1e-4, -5e-5, 1.0]])
    want = cv2.warpPerspective(img.astype(np.float32), H.astype(np.float64), (96, 72))
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H, jnp.float32), (72, 96)))
    # interior agreement (border rows differ by border handling)
    diff = np.abs(want[4:-4, 4:-4] - got[4:-4, 4:-4])
    assert np.percentile(diff, 99) < 3.0, f"p99 diff {np.percentile(diff, 99)}"


def test_warp_matches_opencv_nearest(rng):
    img = rng.uniform(0, 100, (50, 70)).astype(np.float32)
    H = np.array([[0.9, 0.05, 5.0], [0.02, 1.1, -2.0], [0.0, 0.0, 1.0]])
    want = cv2.warpPerspective(img, H, (80, 60), flags=cv2.INTER_NEAREST)
    got = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H, jnp.float32), (60, 80), method="nearest"))
    mismatch = np.mean(want[2:-2, 2:-2] != got[2:-2, 2:-2])
    # NN rounding at exact .5 boundaries may differ on scattered pixels
    assert mismatch < 0.02, f"{mismatch:.3%} nearest-neighbor mismatches"


def test_rectify_pair_and_backwarp(rng):
    F, kp_l, kp_r, (h, w) = _synthetic_F(rng)
    img_l = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    img_r = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    rect = rectify_pair(img_l, img_r, F, kp_l, kp_r)
    assert rect.left.shape == rect.right.shape
    assert rect.left.shape[:2] == rect.canvas
    # rectified matches still row-aligned
    dy = np.abs(np.asarray(rect.matches_left)[1] - np.asarray(rect.matches_right)[1])
    assert np.median(dy) < 1.5

    # back-warp roundtrip: a smooth disparity field warped to the original
    # frame keeps values (NN resampling, interior)
    disp_rect = jnp.asarray(
        np.tile(np.linspace(10, 50, rect.canvas[1], dtype=np.float32), (rect.canvas[0], 1))
    )
    back = disparity_to_original_frame(disp_rect, rect.homographies.H_right, (h, w))
    assert back.shape == (h, w)
    vals = np.asarray(back)
    assert np.isfinite(vals).all()
    assert (vals >= 0).all() and (vals <= 50.0).all()


def test_warp_band_matches_gather_bilinear(rng):
    """The gather-free band warp is exact bilinear: it must agree with the
    general gather warp to float tolerance for any homography within its
    band budget (ops/warp.py warp_band)."""
    from stereo_reconstruction_tpu.ops.warp import band_budget, warp_band

    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
    H = np.array([[1.02, 0.03, -2.5], [-0.02, 0.99, 3.2], [4e-5, -3e-5, 1.0]])
    out = (64, 96)                      # canvas larger than the source
    budget = band_budget(H, out, img.shape[:2])
    assert budget is not None
    want = np.asarray(warp_perspective(
        jnp.asarray(img), jnp.asarray(H, np.float32), out))
    got = np.asarray(warp_band(
        jnp.asarray(img), jnp.asarray(H, np.float32), out, *budget))
    assert np.abs(want - got).max() < 1e-3, np.abs(want - got).max()


def test_warp_band_matches_gather_nearest(rng):
    from stereo_reconstruction_tpu.ops.warp import band_budget, warp_band

    img = rng.uniform(0, 100, (50, 70)).astype(np.float32)
    H = np.array([[0.98, 0.04, 4.0], [0.01, 1.03, -3.0], [0.0, 0.0, 1.0]])
    out = (60, 80)
    budget = band_budget(H, out, img.shape)
    assert budget is not None
    want = np.asarray(warp_perspective(
        jnp.asarray(img), jnp.asarray(H, np.float32), out, method="nearest"))
    got = np.asarray(warp_band(
        jnp.asarray(img), jnp.asarray(H, np.float32), out, *budget,
        method="nearest"))
    assert np.array_equal(want, got)


def test_band_budget_rejects_large_displacement():
    from stereo_reconstruction_tpu.ops.warp import band_budget

    H = np.array([[1.0, 0.0, 300.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    # a 300-px shift of a source that stays visible exceeds every class
    assert band_budget(H, (100, 400), (100, 400)) is None
