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
from jax import lax


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


def _source_coords(Hinv, h_out, w_out):
    ys = jnp.arange(h_out, dtype=jnp.float32)
    xs = jnp.arange(w_out, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    denom = Hinv[2, 0] * gx + Hinv[2, 1] * gy + Hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = (Hinv[0, 0] * gx + Hinv[0, 1] * gy + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * gx + Hinv[1, 1] * gy + Hinv[1, 2]) / denom
    return sx, sy


def band_budget(H, out_shape, src_shape, classes=(2, 4, 8, 16, 32, 64)):
    """Host-side: smallest (dy, dx) budget class covering |sy-y| / |sx-x|
    over the output grid for homography ``H`` (numpy, f64), or ``None``
    if the warp displaces farther than the largest class (fall back to
    the gather warp). Evaluated on the grid corners + edge midlines — the
    Möbius coordinate maps are monotone enough along each axis that the
    extrema live on the boundary; a 9x9 interior grid guards the rest."""
    import numpy as np

    Hinv = np.linalg.inv(np.asarray(H, np.float64))
    h_out, w_out = out_shape
    ys = np.linspace(0, h_out - 1, 9)
    xs = np.linspace(0, w_out - 1, 9)
    gx, gy = np.meshgrid(xs, ys)
    den = Hinv[2, 0] * gx + Hinv[2, 1] * gy + Hinv[2, 2]
    den = np.where(np.abs(den) < 1e-12, 1e-12, den)
    sx = (Hinv[0, 0] * gx + Hinv[0, 1] * gy + Hinv[0, 2]) / den
    sy = (Hinv[1, 0] * gx + Hinv[1, 1] * gy + Hinv[1, 2]) / den
    # only in-source samples constrain the band (out-of-source taps are
    # zero regardless); clamp displacement where the source point is
    # outside the image by more than one pixel
    hs, ws = src_shape[:2]
    live = (sx > -1) & (sx < ws) & (sy > -1) & (sy < hs)
    if not live.any():
        return classes[0], classes[0]
    dy = np.abs(sy - gy)[live].max()
    dx = np.abs(sx - gx)[live].max()
    dy_c = next((c for c in classes if c >= dy + 1.5), None)
    dx_c = next((c for c in classes if c >= dx + 1.5), None)
    if dy_c is None or dx_c is None:
        return None
    return dy_c, dx_c


@functools.partial(
    jax.jit, static_argnames=("out_shape", "dy_budget", "dx_budget", "method"))
def warp_band(
    image: jnp.ndarray,          # (H, W) or (H, W, C)
    H: jnp.ndarray,              # (3, 3) SOURCE -> DEST
    out_shape: Tuple[int, int],
    dy_budget: int,
    dx_budget: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Gather-free perspective warp for small-displacement homographies.

    TPU gathers are the dense stage's bottleneck (one 376x512 bilinear
    gather warp costs ~2.6x the entire Pallas matcher); rectification
    homographies displace pixels by only a few px (Loop-Zhang H is
    near-identity for near-rectified pairs), so the 4 bilinear taps of
    every output pixel live in a static (2*dy+1) x (2*dx+1) band around
    it. The warp is then an exact shift-and-accumulate:

        out[y, x] = sum_{k, j} hat(sy - (y+k)) * hat(sx - (x+j))
                               * img[y+k, x+j]

    over static shifts (k, j) — pure VPU FMAs on lane-aligned slices, no
    gather. All terms outside the true 4 taps are exactly zero (hat
    clamps), so this IS bilinear interpolation, not an approximation;
    ``method="nearest"`` uses round-indicator weights (identical
    semantics to the gather path incl. zero outside the source).

    Budgets are static; ``band_budget`` picks them on host from H. The
    caller must fall back to ``warp_perspective`` when it returns None.
    """
    h_out, w_out = out_shape
    hs, ws = image.shape[:2]
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    img = img.astype(jnp.float32)

    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    sx, sy = _source_coords(Hinv, h_out, w_out)

    DY, DX = dy_budget, dx_budget
    # zero-pad the source so every (y+k, x+j) tap is in-bounds: rows
    # [-DY, h_out+DY), cols [-DX, w_out+DX)
    img_p = jnp.pad(
        img,
        ((DY, max(0, h_out + DY - hs)),
         (DX, max(0, w_out + DX - ws)),
         (0, 0)),
    )

    ys = jnp.arange(h_out, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w_out, dtype=jnp.float32)[None, :]

    if method == "nearest":
        ry = jnp.round(sy)
        rx = jnp.round(sx)
        wy = lambda k: (ry == ys + k).astype(jnp.float32)
        wx = lambda j: (rx == xs + j).astype(jnp.float32)
    else:
        wy = lambda k: jnp.maximum(0.0, 1.0 - jnp.abs(sy - (ys + k)))
        wx = lambda j: jnp.maximum(0.0, 1.0 - jnp.abs(sx - (xs + j)))

    # horizontal weights are k-independent: precompute once
    u = [wx(j - DX) for j in range(2 * DX + 1)]

    acc = jnp.zeros((h_out, w_out, img.shape[-1]), jnp.float32)
    for k in range(2 * DY + 1):
        rows_k = lax.slice(
            img_p, (k, 0, 0), (k + h_out, img_p.shape[1], img_p.shape[2]))
        hval = jnp.zeros_like(acc)
        for j in range(2 * DX + 1):
            shifted = lax.slice(
                rows_k, (0, j, 0), (h_out, j + w_out, img_p.shape[2]))
            hval = hval + u[j][..., None] * shifted
        acc = acc + wy(k - DY)[..., None] * hval

    return acc[..., 0] if squeeze else acc


def transform_points(H: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """cv::perspectiveTransform equivalent: (..., 2, N) points through H."""
    from stereo_reconstruction_tpu.ops import geometry as geo

    hom = geo.to_homogeneous(points) if points.shape[-2] == 2 else points
    mapped = H @ hom
    return mapped[..., :2, :] / mapped[..., 2:3, :]
