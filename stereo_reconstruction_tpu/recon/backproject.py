"""Depth back-projection to a colored vertex grid (device-side).

Equivalent of the reference ``reconstruction()`` vertex loop
(``src/Reconstruction/reconstruction.cpp:152-196``): X = (u - cx) d / fx,
Y = (v - cy) d / fy, Z = d; invalid depth (MINF) yields an invalid vertex
(NaN position here, matching the writer's invalid handling) and color 0.
The reference reads BGR and stores RGB (reconstruction.cpp:189-192); this
framework's images are RGB already.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VertexGrid(NamedTuple):
    positions: jnp.ndarray   # (H, W, 3) float32, NaN = invalid
    colors: jnp.ndarray      # (H, W, 4) uint8 RGBA, 0 = invalid


@jax.jit
def backproject(
    image: jnp.ndarray,      # (H, W, 3) uint8/float RGB
    depth: jnp.ndarray,      # (H, W) float32, -inf = invalid
    K: jnp.ndarray,          # (3, 3)
) -> VertexGrid:
    h, w = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]

    valid = jnp.isfinite(depth)
    d = jnp.where(valid, depth, 0.0)
    X = (us - cx) * d / fx
    Y = (vs - cy) * d / fy
    pos = jnp.stack([X, Y, d], axis=-1)
    pos = jnp.where(valid[..., None], pos, jnp.nan)

    rgb = image.astype(jnp.uint8)
    alpha = jnp.full((h, w, 1), 255, jnp.uint8)
    rgba = jnp.concatenate([rgb, alpha], axis=-1)
    rgba = jnp.where(valid[..., None], rgba, 0)
    return VertexGrid(positions=pos, colors=rgba)
