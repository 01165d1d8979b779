#!/usr/bin/env python3
"""Where do the SIFT describe milliseconds go on TPU? (round 5)

sift_one_image = 12.0 ms/pair batched, of which detect is only 1.4 —
describe (orientation + descriptor on the K=500 winners) is the rest and
is 40% of the whole batched pose stage. This times, with the standard
marginal in-jit K-loop method: the two substages, their raw gathers, and
the one-hot histogram matvecs, so the round-5 optimization is aimed.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from stereo_reconstruction_tpu.config import PipelineConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu.ops import features as feat

    cfg = PipelineConfig().frontend
    pair = downsample_pair(MiddEval3("/root/reference/data/MiddEval3").load_training(13))
    img = jnp.asarray(pair.image_left, jnp.float32)

    det = feat._detect(img, cfg)
    det = jax.tree.map(jnp.asarray, det)
    mag, ang, sigs = det["mag"], det["ang"], det["sigs"]
    plane, si, yi, xi = det["plane"], det["si"], det["yi"], det["xi"]
    oh, ow = det["oh"], det["ow"]

    def marginal_ms(make_body, tag, loop=5, reps=3):
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
        print(f"{tag:28s} {ms:8.2f} ms", flush=True)
        return ms

    eps = lambda i: 1e-6 * (1.0 + i.astype(jnp.float32))

    def ori_body(i):
        o = feat._orientation(mag + eps(i), ang, plane, si, yi, xi, sigs, oh, ow)
        return o[0] + o[-1]
    marginal_ms(ori_body, "orientation (500 kp)")

    ori = feat._orientation(mag, ang, plane, si, yi, xi, sigs, oh, ow)

    def desc_body(i):
        d = feat._descriptor(mag + eps(i), ang, plane, si, yi, xi, sigs, ori, oh, ow)
        return d[0, 0] + d[-1, -1]
    marginal_ms(desc_body, "descriptor (500 kp)")

    # raw 17x17 axis-aligned patch gather (orientation's read pattern)
    R = 8

    def gather17_body(i):
        def one(p, y, x):
            ddy = jnp.arange(-R, R + 1)
            yy = (y + ddy)[:, None]
            xx = (x + ddy)[None, :]
            return mag[p, yy, xx].sum() + eps(i) * 0
        v = jax.vmap(one)(plane, jnp.clip(yi, R, oh - R - 1),
                          jnp.clip(xi, R, ow - R - 1))
        return v.sum()
    marginal_ms(gather17_body, "gather 17x17 x500")

    # descriptor-style scattered bilinear: 256 rotated samples x 4 taps
    GRID = 16

    def bilinear_body(i):
        def one(p, s, y, x, theta, h, w):
            spacing = 0.75 * sigs[s]
            g = (jnp.arange(GRID, dtype=jnp.float32) - (GRID - 1) / 2) * spacing
            gy, gx = jnp.meshgrid(g, g, indexing="ij")
            ct, st = jnp.cos(theta), jnp.sin(theta)
            sx = x.astype(jnp.float32) + ct * gx - st * gy
            sy = y.astype(jnp.float32) + st * gx + ct * gy
            return feat._bilinear(mag, p, sy, sx, h, w).sum() + eps(i) * 0
        v = jax.vmap(one)(plane, si, yi, xi, ori, oh, ow)
        return v.sum()
    marginal_ms(bilinear_body, "bilinear 256x4 x500")

    # one-hot histogram matvec alone (random inputs, same shapes)
    key = jax.random.key(0)
    mws = jax.random.uniform(key, (500, 256))
    idxs = jax.random.randint(key, (500, 256), 0, 128)

    def onehot_body(i):
        onehot = (idxs[..., None] == jnp.arange(128)).astype(jnp.float32)
        d = jnp.einsum("ks,ksb->kb", mws + eps(i), onehot)
        return d.sum()
    marginal_ms(onehot_body, "one-hot 256->128 x500")


if __name__ == "__main__":
    main()
