#!/usr/bin/env python3
"""Benchmark: rectified pairs/s/chip on the dense matcher path.

Prints ONE JSON line:
  {"metric": "rectified_pairs_per_s_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R, "extra": {...}}

The headline metric is throughput of the full rectified dense-matching
step (cost volume + smoothness argmin + back-warp-ready disparity) on one
chip at the reference's default config (block 17, D=200, smoothing 0.9;
reference main.cpp:40) on a real MiddEval3 half-res pair. The baseline
divisor is the BASELINE.json north-star target of 50 pairs/s/chip —
vs_baseline > 1.0 beats the target. Quality (bad-2.0 vs the reference
oracle on a crop) is reported in "extra" to guard against fast-but-wrong
kernels.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_PAIRS_PER_S = 50.0  # BASELINE.json north_star
DATA_ROOT = "/root/reference/data/MiddEval3"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller shapes")
    ap.add_argument("--platform", default=None, help="force JAX platform")
    ap.add_argument("--reps", type=int, default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp

    from stereo_reconstruction_tpu.config import MatcherConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu.ops.block_search import block_search_right
    from stereo_reconstruction_tpu.ops.metrics import evaldisp
    from stereo_reconstruction_tpu import oracle

    dev = jax.devices()[0]
    platform = dev.platform

    # --- load a real pair (Adirondack) at half resolution -------------------
    if os.path.isdir(DATA_ROOT):
        pair = MiddEval3(DATA_ROOT).load_training(0)
        if args.quick:
            pair = downsample_pair(pair)
        L = np.asarray(pair.image_left, np.uint8)
        R = np.asarray(pair.image_right, np.uint8)
    else:  # synthetic fallback
        rng = np.random.default_rng(0)
        L = rng.integers(1, 255, (496, 718, 3), np.uint8)
        R = rng.integers(1, 255, (496, 718, 3), np.uint8)

    h, w = R.shape[:2]
    cfg = MatcherConfig(
        block_size=17,
        min_disparity=0,
        max_disparity=64 if args.quick else 200,
        smooth_factor=0.9,
        row_smooth_iters=2,
    )

    Lj = jax.device_put(jnp.asarray(L), dev)
    Rj = jax.device_put(jnp.asarray(R), dev)

    # --- compile + warmup ----------------------------------------------------
    t0 = time.perf_counter()
    disp = block_search_right(Lj, Rj, cfg)
    jax.block_until_ready(disp)
    compile_s = time.perf_counter() - t0

    # distinct inputs per rep + a dependency chain through the accumulator so
    # no executor-level caching/dedup of identical launches can fake the time
    reps = args.reps or (2 if args.quick else 5)
    variants = [
        jax.device_put(jnp.asarray(np.clip(L.astype(np.int16) + k, 1, 255).astype(np.uint8)), dev)
        for k in range(min(reps, 4))
    ]
    # min over timed reps: the TPU tunnel adds large, occasional stalls that
    # a mean would fold into the kernel time
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        d = block_search_right(variants[i % len(variants)], Rj, cfg)
        jax.block_until_ready(d)
        times.append(time.perf_counter() - t0)
    per_pair = min(times)
    pairs_per_s = 1.0 / per_pair

    # --- quality guard vs the reference-semantics oracle on a crop ----------
    crop = (slice(100, 180), slice(100, 356))
    Lc, Rc = L[crop], R[crop]
    disp_crop = np.asarray(
        block_search_right(
            jnp.asarray(Lc), jnp.asarray(Rc),
            MatcherConfig(block_size=17, max_disparity=48, smooth_factor=0.9,
                          row_smooth_iters=2),
        )
    )
    ref_crop = oracle.block_search_right_fast(Lc, Rc, 17, 0, 48, 0.9)
    m = evaldisp(
        jnp.asarray(disp_crop),
        jnp.asarray(ref_crop.astype(np.float32)),
        jnp.full(ref_crop.shape, 255, jnp.uint8),
        bad_thresh=2.0,
    )
    bad2_vs_ref = float(m["bad_percent"])

    print(
        json.dumps(
            {
                "metric": "rectified_pairs_per_s_per_chip",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / TARGET_PAIRS_PER_S, 4),
                "extra": {
                    "platform": platform,
                    "image": f"{h}x{w}",
                    "max_disparity": cfg.max_disparity,
                    "seconds_per_pair": round(per_pair, 4),
                    "compile_seconds": round(compile_s, 2),
                    "bad2_vs_reference_oracle_crop": round(bad2_vs_ref, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
