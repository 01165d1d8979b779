"""Perspective warps (device-side, jittable).

TPU equivalent of the reference's ``cv::warpPerspective`` calls
(rectification.cpp:486-493 for images, :71-87 with INTER_NEAREST for the
disparity back-warp): inverse mapping — every destination pixel is
projected through H^{-1} into the source image and sampled bilinearly (or
nearest), constant zero border.

The destination canvas is a *static* shape (jit-friendly); the reference's
data-dependent canvases (rectification.cpp:437-484) become a padded canvas
budget chosen on host (see rectify/rectifier.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_shape", "method"))
def warp_perspective(
    image: jnp.ndarray,          # (H, W) or (H, W, C)
    H: jnp.ndarray,              # (3, 3) maps SOURCE coords -> DEST coords
    out_shape: Tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    """Warp ``image`` by homography ``H`` into a (out_shape) canvas.

    Matches cv::warpPerspective(src, dst, H, size) semantics: dst(p) =
    src(H^{-1} p), zero outside the source.
    """
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    return warp_inverse_map(image, Hinv, out_shape, method)


@functools.partial(jax.jit, static_argnames=("out_shape", "method"))
def warp_inverse_map(
    image: jnp.ndarray,
    Hinv: jnp.ndarray,           # (3, 3) maps DEST coords -> SOURCE coords
    out_shape: Tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    h_out, w_out = out_shape
    h, w = image.shape[:2]
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    img = img.astype(jnp.float32)

    ys = jnp.arange(h_out, dtype=jnp.float32)
    xs = jnp.arange(w_out, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                        # (h_out, w_out)
    denom = Hinv[2, 0] * gx + Hinv[2, 1] * gy + Hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = (Hinv[0, 0] * gx + Hinv[0, 1] * gy + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * gx + Hinv[1, 1] * gy + Hinv[1, 2]) / denom

    if method == "nearest":
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = img[iy, ix] * inside[..., None]
    else:
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def gather(yy, xx):
            inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            return v * inside[..., None]

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        fx = fx[..., None]
        fy = fy[..., None]
        out = (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )

    return out[..., 0] if squeeze else out


def transform_points(H: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """cv::perspectiveTransform equivalent: (..., 2, N) points through H."""
    from stereo_reconstruction_tpu.ops import geometry as geo

    hom = geo.to_homogeneous(points) if points.shape[-2] == 2 else points
    mapped = H @ hom
    return mapped[..., :2, :] / mapped[..., 2:3, :]
