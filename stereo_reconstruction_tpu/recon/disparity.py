"""Disparity post-processing (device-side).

Equivalents of the reference's ``removeDisparityOutliers`` /
``scaleDisparityMap`` / ``convertDisparityToDepth``
(``src/Reconstruction/reconstruction.cpp:5-43``). The 500x500 box blur is
a separable ``reduce_window`` pair with reflect-101 borders (cv::blur's
default), O(H*W*kernel) -> fused by XLA; the scalar per-pixel loops are
elementwise ops.

MINF convention: the reference marks invalid depth with -inf
(``src/Eigen.h`` MINF); preserved here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

MINF = -jnp.inf


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def box_blur(img: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """cv::blur equivalent: normalized box filter, BORDER_REFLECT_101."""
    ka = (kernel_size - 1) // 2
    kb = kernel_size - 1 - ka
    padded = _reflect101_pad(img.astype(jnp.float32), ka, kb)
    out = lax.reduce_window(
        padded,
        jnp.float32(0),
        lax.add,
        window_dimensions=(kernel_size, 1),
        window_strides=(1, 1),
        padding="VALID",
    )
    out = lax.reduce_window(
        out,
        jnp.float32(0),
        lax.add,
        window_dimensions=(1, kernel_size),
        window_strides=(1, 1),
        padding="VALID",
    )
    return out / (kernel_size * kernel_size)


def _reflect101_pad(img: jnp.ndarray, before: int, after: int) -> jnp.ndarray:
    """Reflect-101 padding supporting pads larger than dim-1 (a 500-px
    kernel on a ~1000-px image needs ~250 px of border)."""
    for axis in (0, 1):
        n = img.shape[axis]
        idx = jnp.arange(-before, n + after)
        period = max(2 * n - 2, 1)
        idx = jnp.mod(idx, period)
        idx = jnp.where(idx >= n, period - idx, idx)
        img = jnp.take(img, idx, axis=axis)
    return img


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def remove_disparity_outliers(
    disparity: jnp.ndarray,
    kernel_size: int = 500,
    thr_front: float = 1.5,
    thr_back: float = 0.8,
) -> jnp.ndarray:
    """Clamp pixels outside [thr_back*blur, thr_front*blur] to the blurred
    value (reconstruction.cpp:5-18)."""
    disparity = disparity.astype(jnp.float32)
    blurred = box_blur(disparity, kernel_size)
    outlier = (disparity > thr_front * blurred) | (disparity < thr_back * blurred)
    return jnp.where(outlier, blurred, disparity)


@jax.jit
def scale_disparity(disparity: jnp.ndarray, factor: float) -> jnp.ndarray:
    """reconstruction.cpp:21-27."""
    return disparity.astype(jnp.float32) * factor


@jax.jit
def disparity_to_depth(
    disparity: jnp.ndarray, focal_length: float, baseline: float = 1.0
) -> jnp.ndarray:
    """depth = f*b/d; zero disparity -> MINF (reconstruction.cpp:30-43)."""
    disparity = disparity.astype(jnp.float32)
    depth = focal_length * baseline / jnp.where(disparity == 0, 1.0, disparity)
    return jnp.where(disparity == 0, MINF, depth)
