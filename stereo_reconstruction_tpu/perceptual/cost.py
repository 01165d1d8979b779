"""Perceptual (LPIPS) cost volume + window search.

TPU re-design of the reference notebook's row-by-row window search
(``Perceptual_window_search.ipynb`` cells 6-10): instead of a VGG forward
per 17x17 window (H x W/10 forwards!), full-image feature maps are
computed ONCE per image and the cost volume is formed by shifted
normalized-feature differences per stage — mathematically the window
LPIPS up to window-cropping effects (SURVEY.md §3.5), at a tiny fraction
of the FLOPs.

Per stage s (stride 2^s): cost_s[d, y, x] = lins_s . (Fl_s[:, y, x+d/2^s]
- Fr_s[:, y, x])^2 box-averaged over the window footprint; stage volumes
are upsampled to pixel resolution and summed. Fractional feature-space
shifts use linear interpolation between the two neighboring integer
shifts.

The notebook's multiplicative smoothing (cell 8 ``weight_vector``:
weight(i) = (1 - exp(-|i - argmin_prev| / sigma)) + bias, applied for the
previous-row argmin and the previous-pixel argmin, bias 0.85 / sigma 25)
runs as the same row-scan + Jacobi in-row scheme as the SSD matcher.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from stereo_reconstruction_tpu.config import PerceptualConfig
from stereo_reconstruction_tpu.perceptual.vgg import (
    STAGE_STRIDES,
    normalize_features,
    vgg16_features,
)


@functools.partial(jax.jit, static_argnames=("config",))
def lpips_cost_volume(
    params: Dict,
    left: jnp.ndarray,      # (H, W, 3) RGB
    right: jnp.ndarray,     # (H, W, 3)
    config: PerceptualConfig = PerceptualConfig(),
) -> jnp.ndarray:
    """(D, H, W) perceptual cost volume for right-image disparities."""
    h, w = right.shape[:2]
    D = config.max_disparity
    window = config.window_size

    feats_l = [normalize_features(f) for f in vgg16_features(params, left)]
    feats_r = [normalize_features(f) for f in vgg16_features(params, right)]
    lins = params.get("lins") or [
        jnp.full((f.shape[0],), 1.0 / f.shape[0]) for f in feats_l
    ]

    total = jnp.zeros((D, h, w), jnp.float32)
    for s, (fl, fr, lin) in enumerate(zip(feats_l, feats_r, lins)):
        stride = STAGE_STRIDES[s]
        c, hs, ws = fl.shape
        lin = jnp.asarray(lin)

        # per-integer-shift weighted squared diff at stage resolution
        max_shift = (D - 1) // stride + 2
        fl_pad = jnp.pad(fl, ((0, 0), (0, 0), (0, max_shift)))

        def shift_cost(k):
            shifted = lax.dynamic_slice_in_dim(fl_pad, k, ws, axis=2)
            d2 = (shifted - fr) ** 2
            cost = jnp.einsum("c,chw->hw", lin, d2)
            # box-average over the window footprint at this stage
            win_s = max(1, window // stride)
            if win_s > 1:
                pad = [(win_s // 2, win_s - 1 - win_s // 2)] * 2
                cost = lax.reduce_window(
                    cost, jnp.float32(0), lax.add,
                    (win_s, win_s), (1, 1), pad,
                ) / (win_s * win_s)
            return cost

        stage_cost = jax.vmap(shift_cost)(jnp.arange(max_shift))   # (S, hs, ws)

        # pixel-resolution disparities -> fractional stage shifts
        dvals = jnp.arange(D, dtype=jnp.float32) / stride
        k0 = jnp.floor(dvals).astype(jnp.int32)
        frac = dvals - k0
        c0 = stage_cost[jnp.clip(k0, 0, max_shift - 1)]
        c1 = stage_cost[jnp.clip(k0 + 1, 0, max_shift - 1)]
        vol_s = c0 * (1 - frac)[:, None, None] + c1 * frac[:, None, None]

        # spatial upsample to (H, W) by nearest (stage stride replication);
        # when H/W are not stride-multiples the VGG pools floor the stage
        # size, so edge-replicate the last row/col up to the full canvas
        if stride > 1:
            vol_s = jnp.repeat(jnp.repeat(vol_s, stride, axis=1), stride, axis=2)
        vol_s = vol_s[:, :h, :w]
        pad_h, pad_w = h - vol_s.shape[1], w - vol_s.shape[2]
        if pad_h > 0 or pad_w > 0:
            vol_s = jnp.pad(vol_s, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
        total = total + vol_s

    # invalid candidates: x + d beyond the left image
    xs = jnp.arange(w)
    valid = (xs[None, None, :] + jnp.arange(D)[:, None, None]) < w
    return jnp.where(valid, total, jnp.inf)


@functools.partial(jax.jit, static_argnames=("config", "iters"))
def perceptual_smooth_argmin(
    cost: jnp.ndarray,           # (D, H, W)
    config: PerceptualConfig = PerceptualConfig(),
    iters: int = 2,
) -> jnp.ndarray:
    """Notebook smoothing (cells 8,10): multiplicative weights around the
    previous-row and previous-pixel argmins, then argmin. Row scan +
    Jacobi sweeps for the in-row term."""
    D, h, w = cost.shape
    dvals = jnp.arange(D, dtype=jnp.float32)
    bias = config.smoothing_bias
    sigma = config.smoothing_sigma

    def weights(prev_idx):
        """(W,) previous argmins -> (D, W) weights; NaN = no weighting."""
        delta = jnp.abs(dvals[:, None] - prev_idx[None, :])
        wgt = (1.0 - jnp.exp(-delta / sigma)) + bias
        return jnp.where(jnp.isnan(prev_idx)[None, :], 1.0, wgt)

    def resolve(cost_row, up_w, left_idx):
        c = cost_row * up_w * weights(left_idx)
        idx = jnp.argmin(c, axis=0)
        ok = jnp.isfinite(jnp.min(c, axis=0))
        return jnp.where(ok, idx.astype(jnp.float32), 0.0)

    def row_step(prev, inputs):
        cost_row, first = inputs
        up_w = jnp.where(first, 1.0, weights(prev))
        disp = resolve(cost_row, up_w, jnp.full((w,), jnp.nan))
        for _ in range(max(0, iters - 1)):
            left_idx = jnp.concatenate([jnp.array([jnp.nan]), disp[:-1]])
            disp = resolve(cost_row, up_w, left_idx)
        return disp, disp

    first_flags = jnp.zeros((h,), bool).at[0].set(True)
    _, disp = lax.scan(
        row_step, jnp.zeros((w,), jnp.float32),
        (jnp.moveaxis(cost, 1, 0), first_flags),
    )
    return disp


def perceptual_window_search(
    params: Dict,
    left: jnp.ndarray,
    right: jnp.ndarray,
    config: PerceptualConfig = PerceptualConfig(),
) -> jnp.ndarray:
    """Full perceptual disparity search (BASELINE config 3)."""
    cost = lpips_cost_volume(params, left, right, config)
    return perceptual_smooth_argmin(cost, config)
