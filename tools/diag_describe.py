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

    # full describe stage (r5 row-band + one-hot-matmul implementation)
    def describe_body(i):
        det_i = dict(det, mag=mag + eps(i))
        kp = feat._describe(det_i, cfg)
        return kp.descriptors[0, 0] + kp.orientation[-1]
    marginal_ms(describe_body, "describe total (500 kp)")

    # the row-band gather alone
    Pn, H0, W0 = mag.shape
    U = 57

    def rowgather_body(i):
        fr = plane[:, None] * H0 + jnp.clip(
            (yi - U // 2)[:, None] + jnp.arange(U)[None, :], 0, H0 - 1)
        r = jnp.take((mag + eps(i)).reshape(Pn * H0, W0), fr, axis=0)
        return r[0, 0, 0] + r[-1, -1, -1]
    marginal_ms(rowgather_body, f"row-band gather 500x{U}")


if __name__ == "__main__":
    main()
