#!/usr/bin/env python3
"""Where do the batch-8 pipeline's 2.4 s of pose-stage wall clock go?

pose_profile.json says the SINGLE-pair fused pose program costs 57.8 ms
marginal on-device; run_batch's pose stage (upload + dispatch + sync of
the vmapped batch-8 program) measured ~2.4 s in BENCH r4 — ~5x the
8 x 58 ms device estimate. This tool separates:

  * in-jit marginal device time of the batch-8 pose program (K steps in
    one jit, inputs perturbed per step — no relay in the marginal);
  * single-call wall time (includes the relay round-trip);
  * upload time of the compact uint8 image batch;
  * the full run_batch pose stage for reference.

Usage: python tools/diag_batch_pose.py   (TPU via default env)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

DATA_ROOT = "/root/reference/data/MiddEval3"


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from stereo_reconstruction_tpu.config import PipelineConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu.pipeline import _pose_device

    B = 8
    K = 4
    pair = downsample_pair(MiddEval3(DATA_ROOT).load_training(13))
    L = np.asarray(pair.image_left, np.float32)
    R = np.asarray(pair.image_right, np.float32)
    KL = jnp.asarray(pair.intrinsics_left)
    KR = jnp.asarray(pair.intrinsics_right)
    config = PipelineConfig()

    Lb = jnp.stack([jnp.asarray(L)] * B)
    Rb = jnp.stack([jnp.asarray(R)] * B)
    KLb = jnp.stack([KL] * B)
    KRb = jnp.stack([KR] * B)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(B))
    out = {}

    @jax.jit
    def looped(k, off):
        def body(i, acc):
            pose = jax.vmap(
                lambda kk, l, r, kl, kr: _pose_device(kk, l, r, kl, kr,
                                                      config)
            )(keys, Lb + off + 0.25 * (1 + i.astype(jnp.float32)), Rb,
              KLb, KRb)
            return acc + pose.reproj_error_ba[0] + pose.fundamental[0, 0, 0]
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(looped(1, jnp.float32(-3.0)))
    out["compile_s"] = round(time.perf_counter() - t0, 1)
    _ = float(looped(K, jnp.float32(-2.0)))

    t1s, tKs = [], []
    for i in range(3):
        off = jnp.float32(13.0 * (i + 1))
        t0 = time.perf_counter()
        _ = float(looped(1, off))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(looped(K, off + 500.0))
        tKs.append(time.perf_counter() - t0)
    out["pose_batch8_marginal_s"] = round((min(tKs) - min(t1s)) / (K - 1), 3)
    out["pose_batch8_single_call_s"] = round(min(t1s), 3)
    out["pose_batch8_marginal_ms_per_pair"] = round(
        (min(tKs) - min(t1s)) / (K - 1) / B * 1000, 1)

    # upload cost of the compact batch
    u8 = np.stack([L.astype(np.uint8)] * B)
    ts = []
    for i in range(3):
        arr = u8 + np.uint8(i)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(arr))
        ts.append(time.perf_counter() - t0)
    out["upload_4mb_u8_s"] = round(min(ts), 3)

    # reference: the run_batch pose stage end to end
    from stereo_reconstruction_tpu.pipeline_batch import run_batch

    pcfg = config.replace(
        matcher=dataclasses.replace(config.matcher, max_disparity=100),
        recon=dataclasses.replace(config.recon, outlier_kernel=251))
    qb = [pair] * B
    run_batch(qb, pcfg, fetch_depth=False)
    t0 = time.perf_counter()
    res = run_batch(qb, pcfg, fetch_depth=False)
    out["run_batch_total_s"] = round(time.perf_counter() - t0, 3)
    out["run_batch_stages_ms"] = {
        k: round(v * 1000, 1) for k, v in res.timings.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
