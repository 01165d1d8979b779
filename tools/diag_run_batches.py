#!/usr/bin/env python3
"""Instrument run_batches' software pipeline on the relay: per-stage wall
times for each batch, to find where the steady-state bench stalls
(BENCH r4: run_batch ~2.4 s/batch but run_batches sat >10 min).

Usage: python tools/diag_run_batches.py [--batches 3] [--b 8]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()

    import jax

    from stereo_reconstruction_tpu.config import PipelineConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu import pipeline_batch as pb

    qpair = downsample_pair(
        MiddEval3("/root/reference/data/MiddEval3").load_training(13))
    pcfg = PipelineConfig()
    pcfg = pcfg.replace(
        matcher=dataclasses.replace(pcfg.matcher, max_disparity=100),
        recon=dataclasses.replace(pcfg.recon, outlier_kernel=251))
    f32l = np.asarray(qpair.image_left, np.float32)
    f32r = np.asarray(qpair.image_right, np.float32)

    def perturbed(k):
        return [dataclasses.replace(
            qpair, image_left=f32l + 0.25 * k, image_right=f32r + 0.25 * k,
        )] * args.b

    print("compile via run_batch...", flush=True)
    t0 = time.perf_counter()
    pb.run_batch(perturbed(99), pcfg, fetch_depth=False)
    print(f"run_batch compile+exec {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    res = pb.run_batch(perturbed(98), pcfg, fetch_depth=False)
    print(f"run_batch warm {time.perf_counter() - t0:.1f}s "
          f"{ {k: round(v, 3) for k, v in res.timings.items()} }", flush=True)

    # instrumented run_batches
    key = jax.random.key(pcfg.seed)
    n = args.batches
    batches = [perturbed(k) for k in range(n)]
    sts = [None] * n
    t_start = time.perf_counter()

    def stamp(tag):
        print(f"  [{time.perf_counter() - t_start:7.2f}s] {tag}", flush=True)

    for i in range(n):
        stamp(f"upload {i} start")
        sts[i] = pb._stage_upload(batches[i], pcfg,
                                  jax.random.fold_in(key, i), None)
        stamp(f"upload {i} done; pose dispatch {i}")
        pb._stage_pose_dispatch(sts[i], pcfg)
        stamp(f"pose dispatch {i} done")
        if i >= 1:
            pb._stage_host_geometry(sts[i - 1], pcfg)
            stamp(f"host geometry {i - 1} done "
                  f"{ {k: round(v, 3) for k, v in sts[i - 1].timings.items()} }")
        if i >= 2:
            pb._stage_collect(sts[i - 2], False)
            stamp(f"collect {i - 2} done")
    pb._stage_host_geometry(sts[n - 1], pcfg)
    stamp(f"host geometry {n - 1} done")
    for j in (n - 2, n - 1):
        if j >= 0 and sts[j] is not None:
            pb._stage_collect(sts[j], False)
            stamp(f"collect {j} done")
    total = time.perf_counter() - t_start
    print(json.dumps({"batches": n, "B": args.b,
                      "total_s": round(total, 2),
                      "pairs_per_s": round(n * args.b / total, 2)}))


if __name__ == "__main__":
    main()
