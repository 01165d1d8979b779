#!/usr/bin/env python3
"""Decompose the batched dense program's device time (B=8, trainingQ).

run_batch warm: pose ~0.87 s, dense ~0.50 s per 8-pair batch. The
matcher itself is ~2 ms/pair, so ~60 ms/pair of dense time lives in the
warps / outlier clamp / depth / evaldisp around it. Times each part as
its own jitted program (in-jit K-loop marginal, perturbed inputs).

Usage: python tools/diag_dense_parts.py   (TPU via default env)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

from stereo_reconstruction_tpu.config import MatcherConfig
from stereo_reconstruction_tpu.ops.block_search import block_search_right
from stereo_reconstruction_tpu.ops import metrics as metrics_mod
from stereo_reconstruction_tpu.ops.warp import warp_band
from stereo_reconstruction_tpu.recon.disparity import (
    box_blur,
    disparity_to_depth,
    remove_disparity_outliers,
)

B, H, W = 8, 376, 512
K = 4
out = {}
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(1, 255, (B, H, W, 3)), jnp.float32)
disp = jnp.asarray(rng.integers(0, 100, (B, H, W)), jnp.float32)
gt = jnp.asarray(rng.uniform(0, 100, (B, H, W)), jnp.float32)
mask = jnp.full((B, H, W), 255, jnp.uint8)
Hm = jnp.asarray(np.tile(np.array(
    [[1.01, 0.02, -1.5], [-0.01, 0.99, 2.0], [1e-5, -1e-5, 1.0]],
    np.float32), (B, 1, 1)))


def marginal_ms(make_body, tag):
    @jax.jit
    def looped(k, off):
        def body(i, acc):
            return acc + make_body(off + 0.25 * (1 + i.astype(jnp.float32)))
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    _ = float(looped(1, jnp.float32(-3.0)))
    _ = float(looped(K, jnp.float32(-2.0)))
    t1s, tKs = [], []
    for r in range(3):
        off = jnp.float32(7.0 * (r + 1))
        t0 = time.perf_counter(); _ = float(looped(1, off))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _ = float(looped(K, off + 100.0))
        tKs.append(time.perf_counter() - t0)
    ms = (min(tKs) - min(t1s)) / (K - 1) * 1000
    out[tag] = round(ms, 1)
    print(f"{tag:28s} {ms:8.1f} ms / batch8", flush=True)


cfg = MatcherConfig(block_size=17, max_disparity=100, smooth_factor=0.9,
                    row_smooth_iters=2)

marginal_ms(lambda off: jax.vmap(
    lambda l, r: block_search_right(l, r, cfg))(img + off, img)[0, 0, 0],
    "matcher")

marginal_ms(lambda off: jax.vmap(
    lambda im: warp_band(im, Hm[0], (H, W), 4, 8))(img + off)[0, 0, 0],
    "warp_band(4,8) rgb")

marginal_ms(lambda off: jax.vmap(
    lambda d: warp_band(d, Hm[0], (H, W), 4, 8, method="nearest")
)(disp + off)[0, 0, 0], "warp_band(4,8) nn disp")

marginal_ms(lambda off: jax.vmap(
    lambda d: box_blur(d, 251))(disp + off)[0, 0, 0], "box_blur 251")

marginal_ms(lambda off: jax.vmap(
    lambda d: remove_disparity_outliers(d, 251, 1.5, 0.8)
)(disp + off)[0, 0, 0], "outlier clamp 251")

marginal_ms(lambda off: jax.vmap(
    lambda d: disparity_to_depth(d, 300.0, 1.0))(disp + off)[0, 0, 0],
    "depth")

marginal_ms(lambda off: jax.vmap(
    lambda d, g, m: metrics_mod.evaldisp(d, g, m, 2.0, 100.0)["bad_percent"]
)(disp + off, gt, mask)[0], "evaldisp")

print(json.dumps(out))
