#!/usr/bin/env python3
"""TPU microbench of perspective-warp formulations (dense-stage hotspot:
114 ms/batch8 for one bilinear warp = 2.6x the matcher itself).

Variants:
  v0: current ops.warp (2-D advanced indexing on (H, W, C))
  v1: planar flat-index jnp.take per channel (1-D gather on (H*W,))
  v2: one flat gather for all 4 taps stacked (single big 1-D gather)
  v3: f32 index math + single gather of interleaved channels
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

from stereo_reconstruction_tpu.ops.warp import warp_perspective

B = 8
H, W, C = 376, 512, 3
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (B, H, W, C)).astype(np.float32))
Hm = np.eye(3, dtype=np.float32)
Hm[0, 2] = 1.5
Hm[0, 1] = 0.01
Hm[2, 0] = 1e-5
Hb = jnp.asarray(np.stack([Hm] * B))
OUT = (H, W)


def coords(Hinv, h_out, w_out):
    ys = jnp.arange(h_out, dtype=jnp.float32)
    xs = jnp.arange(w_out, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    denom = Hinv[2, 0] * gx + Hinv[2, 1] * gy + Hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = (Hinv[0, 0] * gx + Hinv[0, 1] * gy + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * gx + Hinv[1, 1] * gy + Hinv[1, 2]) / denom
    return sx, sy


def warp_v1(image, Hmat, out_shape):
    """Planar: per-channel flat 1-D take."""
    Hinv = jnp.linalg.inv(Hmat.astype(jnp.float32))
    h, w = image.shape[:2]
    sx, sy = coords(Hinv, *out_shape)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    inside = lambda yy, xx: ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))
    planar = jnp.moveaxis(image, -1, 0)          # (C, H, W)
    flat = planar.reshape(planar.shape[0], -1)   # (C, H*W)

    def tap(yy, xx):
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        v = jnp.take(flat, idx.reshape(-1), axis=1)  # (C, HW_out)
        v = v.reshape(planar.shape[0], *out_shape)
        return v * inside(yy, xx)[None]

    v00 = tap(y0i, x0i); v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i); v11 = tap(y0i + 1, x0i + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return jnp.moveaxis(out, 0, -1)


def warp_v2(image, Hmat, out_shape):
    """All four taps in ONE flat gather (stacked indices)."""
    Hinv = jnp.linalg.inv(Hmat.astype(jnp.float32))
    h, w = image.shape[:2]
    sx, sy = coords(Hinv, *out_shape)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    fx = sx - x0; fy = sy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    planar = jnp.moveaxis(image, -1, 0)
    flat = planar.reshape(planar.shape[0], -1)

    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1])
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1])
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    idx = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)
    v = jnp.take(flat, idx.reshape(-1), axis=1).reshape(
        planar.shape[0], 4, *out_shape)
    v = v * inside[None]
    wgt = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                     (1 - fx) * fy, fx * fy])
    out = jnp.einsum("ckhw,khw->chw", v, wgt)
    return jnp.moveaxis(out, 0, -1)


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
    print(f"{tag:24s} {ms:9.2f} ms (batch {B})", flush=True)
    return ms


print("platform:", jax.devices()[0].platform, flush=True)

# correctness first (vs v0) on one image
ref = warp_perspective(img[0], Hb[0], OUT, method="bilinear")
o1 = warp_v1(img[0], Hb[0], OUT)
o2 = warp_v2(img[0], Hb[0], OUT)
print("v1 max|diff|:", float(jnp.abs(o1 - ref).max()), flush=True)
print("v2 max|diff|:", float(jnp.abs(o2 - ref).max()), flush=True)

out = {}
out["v0_current"] = marginal_ms(
    lambda i: jax.vmap(lambda l, h: warp_perspective(
        l + 0.1 * i.astype(jnp.float32), h, OUT, method="bilinear"))(
            img, Hb)[0, 0, 0, 0], "v0 current")
out["v1_planar_take"] = marginal_ms(
    lambda i: jax.vmap(lambda l, h: warp_v1(
        l + 0.1 * i.astype(jnp.float32), h, OUT))(img, Hb)[0, 0, 0, 0],
    "v1 planar take")
out["v2_stacked_take"] = marginal_ms(
    lambda i: jax.vmap(lambda l, h: warp_v2(
        l + 0.1 * i.astype(jnp.float32), h, OUT))(img, Hb)[0, 0, 0, 0],
    "v2 stacked take")

print(json.dumps({k: round(v, 2) for k, v in out.items()}))
