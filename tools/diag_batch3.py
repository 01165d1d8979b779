#!/usr/bin/env python3
"""Where does the batched pipeline's time go at B=8? (TPU)

Direct per-call timing with host-perturbed inputs (each call distinct so
the relay can't dedupe; the ~45 ms relay latency is small against these
program times). The fori-loop marginal wrapper used elsewhere explodes
compile time on the B=8 pose program — don't use it here."""

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

from stereo_reconstruction_tpu.config import PipelineConfig
from stereo_reconstruction_tpu.data import MiddEval3
from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
from stereo_reconstruction_tpu.data.records import pad_to
from stereo_reconstruction_tpu.ops.features import detect_and_describe
from stereo_reconstruction_tpu.pipeline_batch import _dense_batch, _pose_batch
from stereo_reconstruction_tpu.rectify.rectifier import static_canvas

B = 8
pair = downsample_pair(MiddEval3("/root/reference/data/MiddEval3").load_training(13))
cfg = PipelineConfig()
cfg = cfg.replace(
    matcher=dataclasses.replace(cfg.matcher, max_disparity=100),
    recon=dataclasses.replace(cfg.recon, outlier_kernel=251),
)

hmax = pair.height + (-pair.height) % 8
wmax = pair.width + (-pair.width) % 128
p8 = pad_to(pair, hmax, wmax)
Lnp = np.asarray(p8.image_left, np.float32)
Rnp = np.asarray(p8.image_right, np.float32)
KL = jnp.stack([jnp.asarray(p8.intrinsics_left)] * B)
KR = jnp.stack([jnp.asarray(p8.intrinsics_right)] * B)
keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.key(0), jnp.arange(B))

print("platform:", jax.devices()[0].platform, flush=True)
out = {}


def timeit(fn, tag, reps=3):
    fn(0.0)                                   # compile + warm
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(0.25 * r)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000
    print(f"{tag:30s} {ms:9.1f} ms", flush=True)
    return ms


# 1. full vmapped pose program, B=8
def pose_call(eps):
    L = jnp.stack([jnp.asarray(Lnp + eps)] * B)
    R = jnp.stack([jnp.asarray(Rnp)] * B)
    pe = _pose_batch(keys, L, R, KL, KR, cfg)
    jax.block_until_ready(pe.pose)
out["pose_batch8"] = timeit(pose_call, "pose batch8")

# 2. vmapped SIFT over 16 images (half the pose program's frontend work
# runs per image; this isolates the frontend at batch width)
sift16 = jax.jit(jax.vmap(lambda im: detect_and_describe(im, cfg.frontend)))

def sift_call(eps):
    imgs = jnp.stack([jnp.asarray(Lnp + eps)] * B + [jnp.asarray(Rnp + eps)] * B)
    kp = sift16(imgs)
    jax.block_until_ready(kp.descriptors)
out["sift_16_images"] = timeit(sift_call, "sift 16 images")

# 3. dense program, compute only
canvas = static_canvas((hmax, wmax), (hmax, wmax), cfg.rectify)
Hn = np.eye(3, dtype=np.float32); Hn[0, 2] = 1.5
Hb = jnp.stack([jnp.asarray(Hn)] * B)
ok = jnp.ones((B,), bool)

def dense_call(eps):
    L = jnp.stack([jnp.asarray(Lnp + eps)] * B)
    R = jnp.stack([jnp.asarray(Rnp)] * B)
    d, _, z = _dense_batch(L, R, Hb, Hb, KR, ok, cfg, canvas, (hmax, wmax), (4, 4))
    jax.block_until_ready((d, z))
    return d, z
out["dense_batch8_compute"] = timeit(dense_call, "dense batch8 compute")

# 4. transfer: device_get of disp+depth (12 MB)
d, z = dense_call(0.0)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.device_get((d, z))
    ts.append(time.perf_counter() - t0)
out["readback_12MB_ms"] = min(ts) * 1000
print(f"{'device_get disp+depth':30s} {out['readback_12MB_ms']:9.1f} ms", flush=True)

# 5. upload: host -> device of the 8-pair image batch (14 MB)
ts = []
for r in range(3):
    t0 = time.perf_counter()
    x = jax.device_put(np.stack([Lnp + 0.1 * r] * B))
    y = jax.device_put(np.stack([Rnp + 0.1 * r] * B))
    jax.block_until_ready((x, y))
    ts.append(time.perf_counter() - t0)
out["upload_14MB_ms"] = min(ts) * 1000
print(f"{'device_put image batch':30s} {out['upload_14MB_ms']:9.1f} ms", flush=True)

print(json.dumps({k: round(v, 1) for k, v in out.items()}))
