#!/usr/bin/env python3
"""Benchmark: rectified pairs/s/chip on the dense matcher path.

Prints ONE JSON line:
  {"metric": "rectified_pairs_per_s_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R, "extra": {...}}

Headline: throughput of the dense rectified matching step (cost volume +
smoothness argmin) with the reference's matcher settings (block 17,
smoothing 0.9; main.cpp:40) on the real Teddy pair at the BASELINE
north-star evaluation resolution (trainingQ = quarter res, D=100),
batched 8 pairs per step (single chip). ``--full`` benches half
resolution / D=200 instead. The baseline divisor is the BASELINE.json
north-star target of 50 pairs/s/chip. Quality (bad-2.0 vs the exact
reference-semantics oracle on a crop) guards against fast-but-wrong
kernels.

Timing notes (axon relay): identical executions are deduped remotely and
block_until_ready does not fence — every rep uses unique inputs and
fences via host readback; min-of-reps drops relay stalls.
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
    ap.add_argument("--quick", action="store_true",
                    help="(kept for compat; quarter res is the default)")
    ap.add_argument("--full", action="store_true",
                    help="bench half resolution / D=200 instead of trainingQ")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
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

    if os.path.isdir(DATA_ROOT):
        pair = MiddEval3(DATA_ROOT).load_training(13)  # Teddy (has real GT)
        if not args.full:
            pair = downsample_pair(pair)  # trainingQ, the north-star eval res
        L = np.asarray(pair.image_left, np.uint8)
        R = np.asarray(pair.image_right, np.uint8)
    else:
        rng = np.random.default_rng(0)
        L = rng.integers(1, 255, (750, 900, 3), np.uint8)
        R = rng.integers(1, 255, (750, 900, 3), np.uint8)

    h, w = R.shape[:2]
    cfg = MatcherConfig(
        block_size=17,
        min_disparity=0,
        max_disparity=200 if args.full else 100,
        smooth_factor=0.9,
        row_smooth_iters=2,
    )

    B = args.batch
    Lb = jnp.stack([jnp.asarray(L, jnp.float32)] * B)
    Rb = jnp.stack([jnp.asarray(R, jnp.float32)] * B)
    Lb = jax.device_put(Lb, dev)
    Rb = jax.device_put(Rb, dev)

    fn = jax.jit(jax.vmap(lambda l, r: block_search_right(l, r, cfg)))

    t0 = time.perf_counter()
    d = fn(Lb, Rb)
    _ = float(d[0, 0, 0])
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(args.reps):
        Li = Lb + (0.25 + 0.25 * i)
        _ = float(Li[0, 0, 0, 0])   # materialize input before timing
        t0 = time.perf_counter()
        d = fn(Li, Rb)
        _ = float(d[0, 0, 0]) + float(d[-1, -1, -1])   # fence via readback
        times.append(time.perf_counter() - t0)
    per_pair = min(times) / B
    pairs_per_s = 1.0 / per_pair

    # quality guard vs the exact reference-semantics oracle on a crop
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
                    "batch": B,
                    "max_disparity": cfg.max_disparity,
                    "ms_per_pair": round(per_pair * 1000, 2),
                    "compile_seconds": round(compile_s, 2),
                    "bad2_vs_reference_oracle_crop": round(
                        float(m["bad_percent"]), 4
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
