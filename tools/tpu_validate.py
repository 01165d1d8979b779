#!/usr/bin/env python3
"""Validate + time the Mosaic-compiled Pallas cost-volume kernel on TPU.

Checks (on the real chip):
  1. compiled pallas_cost_volume_right_ssd vs the exact oracle cost volume
     on a real Teddy crop (bit-level agreement of the +inf pattern, tight
     tolerance on finite costs);
  2. block_search_right with backend="pallas" vs the reference-semantics
     oracle disparity (bad-2.0 on the crop);
  3. timings: pallas vs xla cost volume (and the full matcher) at
     trainingQ (quarter res, D=100) and half res / D=200.

Usage:  python tools/tpu_validate.py [--skip-timing]
(run with the axon plugin on PYTHONPATH; timings use varied inputs +
readback fences per CLAUDE.md relay notes)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

DATA_ROOT = "/root/reference/data/MiddEval3"


def fence(x):
    return float(np.asarray(x).ravel()[0]) + float(np.asarray(x).ravel()[-1])


def time_fn(fn, *args, reps=4, vary=None):
    """min-of-reps wall time; varies inputs per rep (relay dedup)."""
    out = fn(*args)
    fence(out)  # compile
    times = []
    for i in range(reps):
        a = list(args)
        if vary is not None:
            a[vary] = a[vary] + (0.25 + 0.25 * i)
            _ = fence(a[vary])
        t0 = time.perf_counter()
        out = fn(*a)
        fence(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    # probe: the relay can wedge after killed clients (CLAUDE.md)
    assert abs(float(jnp.sin(1.0)) - 0.8414709848) < 1e-6, "relay probe failed"

    from stereo_reconstruction_tpu import oracle
    from stereo_reconstruction_tpu.config import MatcherConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu.ops import cost_volume as cv
    from stereo_reconstruction_tpu.ops.block_search import block_search_right
    from stereo_reconstruction_tpu.ops.metrics import evaldisp
    from stereo_reconstruction_tpu.ops.pallas_cost_volume import (
        pallas_cost_volume_right_ssd,
    )

    pair = MiddEval3(DATA_ROOT).load_training(13)  # Teddy
    pair = downsample_pair(pair)                   # trainingQ
    L = np.asarray(pair.image_left, np.uint8)
    R = np.asarray(pair.image_right, np.uint8)
    report = {}

    # ---- 1. compiled cost volume vs oracle on a crop ----
    crop = (slice(100, 164), slice(100, 292))
    Lc, Rc = L[crop], R[crop]
    want = oracle.cost_volume_right(Lc, Rc, 17, 0, 48)       # (H, W, D)
    got = np.asarray(
        pallas_cost_volume_right_ssd(
            jnp.asarray(Lc, jnp.float32), jnp.asarray(Rc, jnp.float32),
            block_size=17, min_disparity=0, max_disparity=48,
        )
    )
    got_hwd = np.moveaxis(got, 0, -1)
    inf_match = bool((np.isinf(got_hwd) == np.isinf(want)).all())
    finite = np.isfinite(want)
    max_rel = float(
        np.abs(got_hwd[finite] - want[finite]).max()
        / max(1e-9, np.abs(want[finite]).max())
    )
    report["cost_volume_inf_pattern_match"] = inf_match
    report["cost_volume_max_rel_err"] = max_rel
    print(f"cost volume: inf pattern match={inf_match} max_rel_err={max_rel:.3e}",
          flush=True)

    # ---- 2. end-to-end matcher vs oracle disparity on the crop ----
    ref_disp = oracle.block_search_right_fast(Lc, Rc, 17, 0, 48, 0.9)
    for backend in ("pallas", "xla"):
        disp = np.asarray(
            block_search_right(
                jnp.asarray(Lc), jnp.asarray(Rc),
                MatcherConfig(block_size=17, max_disparity=48,
                              smooth_factor=0.9, row_smooth_iters=2,
                              backend=backend),
            )
        )
        m = evaldisp(
            jnp.asarray(disp), jnp.asarray(ref_disp.astype(np.float32)),
            jnp.full(ref_disp.shape, 255, jnp.uint8), bad_thresh=2.0,
        )
        report[f"bad2_vs_oracle_{backend}"] = float(m["bad_percent"])
        print(f"{backend}: bad-2.0 vs oracle crop = "
              f"{float(m['bad_percent']):.4f}%", flush=True)

    if args.skip_timing:
        print(json.dumps(report))
        return

    # ---- 3. timings ----
    import functools
    configs = [
        ("trainingQ_D100", L, R, 100),
    ]
    pair_h = MiddEval3(DATA_ROOT).load_training(13)
    Lh = np.asarray(pair_h.image_left, np.uint8)[::2, ::2]
    Rh = np.asarray(pair_h.image_right, np.uint8)[::2, ::2]
    configs.append(("half_D200", Lh, Rh, 200))

    for name, Li, Ri, D in configs:
        Lj = jnp.asarray(Li, jnp.float32)
        Rj = jnp.asarray(Ri, jnp.float32)
        for label, fn in [
            ("pallas_cv", functools.partial(
                pallas_cost_volume_right_ssd,
                block_size=17, min_disparity=0, max_disparity=D)),
            ("xla_cv", functools.partial(
                cv.cost_volume_right_ssd,
                block_size=17, min_disparity=0, max_disparity=D)),
        ]:
            t0 = time.perf_counter()
            t = time_fn(fn, Lj, Rj, reps=args.reps, vary=0)
            total = time.perf_counter() - t0
            report[f"{name}_{label}_ms"] = round(t * 1000, 2)
            report[f"{name}_{label}_compile_s"] = round(total - t * args.reps, 1)
            print(f"{name} {label}: {t*1000:.2f} ms "
                  f"(incl-compile wall {total:.1f}s)", flush=True)
        for backend in ("pallas", "xla"):
            cfg = MatcherConfig(block_size=17, min_disparity=0,
                                max_disparity=D, smooth_factor=0.9,
                                row_smooth_iters=2, backend=backend)
            fn = functools.partial(block_search_right, config=cfg)
            t0 = time.perf_counter()
            t = time_fn(lambda l, r: fn(l, r), Lj, Rj, reps=args.reps, vary=0)
            total = time.perf_counter() - t0
            report[f"{name}_match_{backend}_ms"] = round(t * 1000, 2)
            report[f"{name}_match_{backend}_compile_s"] = round(
                total - t * args.reps, 1)
            print(f"{name} matcher[{backend}]: {t*1000:.2f} ms "
                  f"(incl-compile wall {total:.1f}s)", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
