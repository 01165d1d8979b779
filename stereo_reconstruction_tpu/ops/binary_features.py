"""ORB-style binary feature detection + description (pure JAX).

TPU-native replacement for the cv::ORB / cv::BRISK frontend of the
reference's uncalibrated path (``src/rectification_main.cpp:26-63``:
ORB with 500 features, scaleFactor 1.2, 4 levels, FAST threshold 20,
Harris ranking, patch size 21). Instead of translating OpenCV's
pointer-chasing FAST, every stage is a dense, vectorized array program:

  * image pyramid (4 levels, factor 1.2) via ``jax.image.resize``;
  * FAST-16 segment test evaluated for ALL pixels at once — the 16
    Bresenham-circle samples become 16 rolled copies of the image, and
    the "9 contiguous" arc test a circular windowed sum;
  * Harris corner response (Sobel structure tensor) for ranking, exactly
    ORB's HARRIS_SCORE mode;
  * 3x3 non-max suppression + global fixed-K top-K (static shapes);
  * intensity-centroid orientation (ORB's rotation estimate);
  * rotated-BRIEF 256-bit descriptor from a fixed pseudo-random pattern,
    stored as a (K, 256) float 0/1 matrix so Hamming matching is one MXU
    matmul (see ops/matching.py:match_descriptors_binary).

The descriptor layout ({0,1} floats rather than packed bytes) is a
deliberate TPU choice: Hamming(a, b) = |a| + |b| - 2 a.b, which turns
brute-force matching into a single (K x K) Gram matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stereo_reconstruction_tpu.config import OrbConfig
from stereo_reconstruction_tpu.ops.features import (
    Keypoints,
    gaussian_blur,
    rgb_to_gray,
)


def _bilinear(img, sy, sx):
    """Bilinear sample of a single (H, W) plane (features._bilinear now
    operates on the flat SIFT pyramid stack; rBRIEF samples one plane)."""
    h, w = img.shape
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    v00 = img[y0, x0]; v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]; v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)

# FAST-16: the 16 (dy, dx) offsets of the radius-3 Bresenham circle, in
# circular order (OpenCV's ordering starts at (0, 3) going clockwise).
_FAST_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _brief_pattern(num_bits: int, patch_size: int) -> np.ndarray:
    """Fixed pseudo-random BRIEF sampling pattern: ``num_bits`` point
    pairs ~ N(0, (patch/5)^2), clipped inside the patch. Deterministic
    (seeded) so descriptors are reproducible across runs — the
    framework-wide determinism policy (SURVEY §5: no std::random_device).
    """
    rng = np.random.default_rng(0x0B1EF)
    sigma = patch_size / 5.0
    lim = patch_size / 2.0 - 1.0
    pts = rng.normal(0.0, sigma, size=(num_bits, 2, 2))
    return np.clip(pts, -lim, lim).astype(np.float32)   # (bits, pair, yx)


@functools.partial(jax.jit, static_argnames=("config",))
def detect_and_describe_orb(
    image: jnp.ndarray,                   # (H, W, 3) or (H, W), 0..255
    config: OrbConfig = OrbConfig(),
) -> Keypoints:
    gray = rgb_to_gray(image)             # keep 0..255: FAST threshold is 20 DN
    h, w = gray.shape
    K = config.max_keypoints

    per_level = []
    for level in range(config.num_levels):
        scale = config.scale_factor ** level
        lh, lw = int(round(h / scale)), int(round(w / scale))
        if lh < 2 * config.edge_margin + 8 or lw < 2 * config.edge_margin + 8:
            break
        img = gray if level == 0 else jax.image.resize(gray, (lh, lw), "linear")
        per_level.append(_level_keypoints(img, float(scale), config, K))

    xy = jnp.concatenate([c[0] for c in per_level])
    resp = jnp.concatenate([c[1] for c in per_level])
    ori = jnp.concatenate([c[2] for c in per_level])
    desc = jnp.concatenate([c[3] for c in per_level])
    valid = jnp.concatenate([c[4] for c in per_level])
    scl = jnp.concatenate([c[5] for c in per_level])

    score = jnp.where(valid, resp, -jnp.inf)
    top = jnp.argsort(-score)[:K]
    return Keypoints(
        xy=xy[top], scale=scl[top], response=resp[top],
        orientation=ori[top], descriptors=desc[top], valid=valid[top],
    )


def _level_keypoints(img, scale: float, config: OrbConfig, K: int):
    lh, lw = img.shape
    t = float(config.fast_threshold)

    # --- FAST-16 segment test, all pixels at once -----------------------
    shifted = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in _FAST_OFFSETS]
    )                                                    # (16, lh, lw)
    brighter = shifted > img[None] + t
    darker = shifted < img[None] - t
    is_corner = _arc_test(brighter, config.fast_arc) | _arc_test(darker, config.fast_arc)

    # --- Harris response for ranking (ORB::HARRIS_SCORE) ----------------
    gx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) / 2.0
    gy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) / 2.0
    sxx = gaussian_blur(gx * gx, 1.5)
    syy = gaussian_blur(gy * gy, 1.5)
    sxy = gaussian_blur(gx * gy, 1.5)
    harris = (sxx * syy - sxy * sxy) - config.harris_k * (sxx + syy) ** 2

    # --- mask: corners only, inside the margin, 3x3 non-max -------------
    m = config.edge_margin
    ys, xs = jnp.arange(lh), jnp.arange(lw)
    interior = (
        (ys[:, None] >= m) & (ys[:, None] < lh - m)
        & (xs[None, :] >= m) & (xs[None, :] < lw - m)
    )
    resp = jnp.where(is_corner & interior, harris, -jnp.inf)
    local_max = lax.reduce_window(
        resp, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    resp = jnp.where((resp == local_max) & jnp.isfinite(resp), resp, -jnp.inf)

    flat = resp.reshape(-1)
    top = jnp.argsort(-flat)[:K]
    valid = jnp.isfinite(flat[top]) & (flat[top] > 0)
    yi, xi = jnp.unravel_index(top, resp.shape)

    # --- intensity-centroid orientation (patch radius = patch//2) -------
    ori = _intensity_centroid(img, yi, xi, config.patch_size)

    # --- rotated BRIEF on the smoothed image -----------------------------
    smooth = gaussian_blur(img, 2.0)
    pattern = jnp.asarray(_brief_pattern(config.num_bits, config.patch_size))
    desc = _rbrief(smooth, yi, xi, ori, pattern)

    xy = jnp.stack([xi.astype(jnp.float32) * scale,
                    yi.astype(jnp.float32) * scale], axis=-1)
    scl = jnp.full((K,), scale, jnp.float32)
    return xy, flat[top], ori, desc, valid, scl


def _arc_test(bits: jnp.ndarray, arc: int) -> jnp.ndarray:
    """True where >= ``arc`` CONTIGUOUS circle samples (circularly) are
    set. Windowed sums over the doubled bit stack — no per-pixel loops."""
    b = jnp.concatenate([bits, bits[: arc - 1]], axis=0).astype(jnp.float32)
    csum = jnp.cumsum(b, axis=0)
    zero = jnp.zeros_like(csum[:1])
    csum = jnp.concatenate([zero, csum], axis=0)        # (16+arc, lh, lw)
    win = csum[arc:] - csum[:-arc]                      # windowed sums len=arc
    return jnp.max(win, axis=0) >= arc


def _intensity_centroid(img, yi, xi, patch_size: int):
    """ORB orientation: theta = atan2(m01, m10) over a circular patch."""
    r = patch_size // 2
    lh, lw = img.shape
    ys = jnp.clip(yi, r, lh - r - 1)
    xs = jnp.clip(xi, r, lw - r - 1)
    dy = jnp.arange(-r, r + 1, dtype=jnp.float32)[:, None]
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)[None, :]
    circ = (dy * dy + dx * dx) <= r * r

    def one(y, x):
        p = lax.dynamic_slice(img, (y - r, x - r), (2 * r + 1, 2 * r + 1))
        p = jnp.where(circ, p, 0.0)
        m10 = jnp.sum(p * dx)
        m01 = jnp.sum(p * dy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(ys, xs)


def _rbrief(img, yi, xi, ori, pattern):
    """Rotated BRIEF: bit = I(R(theta) p1) < I(R(theta) p2), bilinear."""
    lh, lw = img.shape

    def one(y, x, theta):
        ct, st = jnp.cos(theta), jnp.sin(theta)
        py, px = pattern[..., 0], pattern[..., 1]       # (bits, 2)
        ry = st * px + ct * py
        rx = ct * px - st * py
        sy = jnp.clip(y.astype(jnp.float32) + ry, 0.0, lh - 2.0)
        sx = jnp.clip(x.astype(jnp.float32) + rx, 0.0, lw - 2.0)
        v = _bilinear(img, sy, sx)                      # (bits, 2)
        return (v[:, 0] < v[:, 1]).astype(jnp.float32)

    return jax.vmap(one)(yi, xi, ori)
