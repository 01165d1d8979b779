#!/usr/bin/env python3
"""Probe: TPU cost of row-gathers and one-hot lane selection — the
building blocks of the matmul-based SIFT describe rewrite (round 5).

Scalar gathers measured ~70M elem/s (diag_describe: 14-17 ns/element);
if full-row gathers hit the fast embedding-lookup path and the one-hot
lane-select matmul runs at MXU speed, describe drops from ~13 ms to ~2.
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
        print(f"{tag:34s} {ms:8.2f} ms", flush=True)
        return ms

    key = jax.random.key(0)
    P, H0, W0 = 12, 376, 512
    table = jax.random.uniform(key, (P * H0, W0))
    K, U = 500, 85

    ridx = jax.random.randint(key, (K, U), 0, P * H0 - 1)

    def rowgather_body(i):
        r = jnp.take(table + 1e-6 * i.astype(jnp.float32), ridx, axis=0)
        return r[0, 0, 0] + r[-1, -1, -1]
    marginal_ms(rowgather_body, f"row gather ({K}x{U} rows of {W0})")

    # 17-row variant (orientation-only footprint)
    ridx17 = ridx[:, :17]

    def rowgather17_body(i):
        r = jnp.take(table + 1e-6 * i.astype(jnp.float32), ridx17, axis=0)
        return r[0, 0, 0] + r[-1, -1, -1]
    marginal_ms(rowgather17_body, f"row gather ({K}x17 rows of {W0})")

    # one-hot lane selection: rows (K, U, W0) x wx (K, S, W0) -> (K, S, U)
    S = 256
    rows = jax.random.uniform(key, (K, U, W0))
    sx = jax.random.uniform(key, (K, S), minval=1.0, maxval=W0 - 2.0)

    def lane_select_body(i):
        x0 = jnp.floor(sx)
        fx = (sx - x0)[..., None]
        lanes = jnp.arange(W0)[None, None, :]
        wx = ((lanes == x0[..., None]) * (1 - fx)
              + (lanes == x0[..., None] + 1) * fx)            # (K, S, W0)
        A = jnp.einsum("kuw,ksw->ksu", rows + 1e-6 * i.astype(jnp.float32),
                       wx, precision=lax.Precision.HIGH)
        return A[0, 0, 0] + A[-1, -1, -1]
    marginal_ms(lane_select_body, f"bilinear-x one-hot einsum S={S}")

    # full separable bilinear: contract u as well
    sy = jax.random.uniform(key, (K, S), minval=1.0, maxval=U - 2.0)

    def separable_body(i):
        x0 = jnp.floor(sx)
        fx = (sx - x0)[..., None]
        lanes = jnp.arange(W0)[None, None, :]
        wx = ((lanes == x0[..., None]) * (1 - fx)
              + (lanes == x0[..., None] + 1) * fx)
        y0 = jnp.floor(sy)
        fy = (sy - y0)[..., None]
        us = jnp.arange(U)[None, None, :]
        wy = ((us == y0[..., None]) * (1 - fy)
              + (us == y0[..., None] + 1) * fy)               # (K, S, U)
        A = jnp.einsum("kuw,ksw->ksu", rows + 1e-6 * i.astype(jnp.float32),
                       wx, precision=lax.Precision.HIGH)
        v = jnp.einsum("ksu,ksu->ks", A, wy)
        return v[0, 0] + v[-1, -1]
    marginal_ms(separable_body, "full separable bilinear 256 smp")


if __name__ == "__main__":
    main()
