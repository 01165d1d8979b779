#!/usr/bin/env python3
"""TPU validation of the precision + orientation-gather fixes: run_pair
quality, batch compile, dense sub-stage timings (continuation of
diag_batch.py after its _pose_batch compile crash)."""

import dataclasses
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

from stereo_reconstruction_tpu.config import PipelineConfig
from stereo_reconstruction_tpu.data import MiddEval3
from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
from stereo_reconstruction_tpu.data.records import pad_to
from stereo_reconstruction_tpu.ops.block_search import block_search_right
from stereo_reconstruction_tpu.ops.warp import warp_perspective
from stereo_reconstruction_tpu.pipeline import run_pair
from stereo_reconstruction_tpu.pipeline_batch import run_batch
from stereo_reconstruction_tpu.recon.disparity import (
    disparity_to_depth,
    remove_disparity_outliers,
)
from stereo_reconstruction_tpu.rectify.rectifier import static_canvas

pair = downsample_pair(MiddEval3("/root/reference/data/MiddEval3").load_training(13))
pcfg = PipelineConfig()
pcfg = pcfg.replace(
    matcher=dataclasses.replace(pcfg.matcher, max_disparity=100),
    recon=dataclasses.replace(pcfg.recon, outlier_kernel=251),
)

print("platform:", jax.devices()[0].platform, flush=True)

res1 = run_pair(pair, pcfg)
print("run_pair bad2:", res1.metrics.get("bad_percent"),
      "err_ba:", float(res1.pose.reproj_error_ba), flush=True)

B = 4
t0 = time.perf_counter()
bres = run_batch([pair] * B, pcfg)
print("batch compile+run:", round(time.perf_counter() - t0, 1), "s", flush=True)
bres = run_batch([pair] * B, pcfg)
print("batch warm timings:", {k: round(v, 3) for k, v in bres.timings.items()},
      flush=True)
print("run_batch bad2[0]:", bres.metrics[0].get("bad_percent"),
      "err_ba:", np.asarray(bres.pose.reproj_error_ba).tolist(), flush=True)
d1 = res1.disparity
db = bres.disparity[0][: d1.shape[0], : d1.shape[1]]
print("disparity agreement batch vs single:", float((d1 == db).mean()), flush=True)

# ---- dense sub-stage timings (marginal, vmapped batch of 8) ----
B = 8
hmax = pair.height + (-pair.height) % 8
wmax = pair.width + (-pair.width) % 128

p8 = pad_to(pair, hmax, wmax)
L = jnp.stack([jnp.asarray(p8.image_left)] * B)
canvas = static_canvas((hmax, wmax), (hmax, wmax), pcfg.rectify)
Hn = np.eye(3, dtype=np.float32)
Hn[0, 2] = 1.5
Hl = jnp.stack([jnp.asarray(Hn)] * B)


def marginal_ms(make_body, tag, loop=4, reps=3):
    def looped(k):
        def body(i, acc):
            return acc + make_body(i)
        return jax.jit(lambda: lax.fori_loop(0, k, body, jnp.float32(0.0)))

    f1, fK = looped(1), looped(loop)
    float(f1()); float(fK())
    t1s, tKs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK()); tKs.append(time.perf_counter() - t0)
    ms = (min(tKs) - min(t1s)) / (loop - 1) * 1000
    print(f"{tag:28s} {ms:9.2f} ms (batch {B})", flush=True)
    return ms


out = {}
out["warp_bilinear"] = marginal_ms(
    lambda i: jax.vmap(lambda l, h: warp_perspective(
        l + 0.1 * i.astype(jnp.float32), h, canvas, method="bilinear"))(
            L, Hl)[0, 0, 0, 0],
    "warp bilinear x1")

rect = jax.vmap(lambda l, h: warp_perspective(l, h, canvas, method="bilinear"))(L, Hl)

out["matcher"] = marginal_ms(
    lambda i: jax.vmap(lambda l, r: block_search_right(l, r, pcfg.matcher))(
        rect + 0.1 * i.astype(jnp.float32), rect)[0, 0, 0],
    "matcher (canvas res)")

disp = jax.vmap(lambda l, r: block_search_right(l, r, pcfg.matcher))(rect, rect)

out["backwarp_nn"] = marginal_ms(
    lambda i: jax.vmap(lambda d, h: warp_perspective(
        d + 0.1 * i.astype(jnp.float32), jnp.linalg.inv(h), (hmax, wmax),
        method="nearest"))(disp, Hl)[0, 0, 0],
    "back-warp NN")

dori = jax.vmap(lambda d, h: warp_perspective(
    d, jnp.linalg.inv(h), (hmax, wmax), method="nearest"))(disp, Hl)

out["outlier_blur251"] = marginal_ms(
    lambda i: jax.vmap(lambda d: remove_disparity_outliers(
        d + 0.1 * i.astype(jnp.float32), 251, 1.5, 0.8))(dori)[0, 0, 0],
    "outlier clamp (blur 251)")

out["depth"] = marginal_ms(
    lambda i: jax.vmap(lambda d: disparity_to_depth(
        d + 1.0 + i.astype(jnp.float32), 3000.0, 1.0))(dori)[0, 0, 0],
    "depth")

print(json.dumps({k: round(v, 2) for k, v in out.items()}))
