#!/usr/bin/env python3
"""Scaling-efficiency bench on the virtual N-device CPU mesh.

Real multi-chip hardware is not reachable from this environment (one TPU
chip behind a relay), so scaling is characterized the way it can be
honestly: on the XLA CPU backend with ``--xla_force_host_platform_device_
count=N`` virtual devices. Two caveats make raw wall-clock weak scaling
meaningless here and are corrected for:

  * the host has only 2 physical cores, so N virtual devices time-slice:
    total wall time grows with total work regardless of the sharding;
  * what actually determines multi-chip efficiency on a real pod slice —
    where each shard DOES own its compute — is the overhead the sharded
    program adds on top of the equivalent unsharded computation:
    partitioning, halo exchanges (ppermute), reductions (psum), and any
    redundant warm-up work.

The bench therefore reports, per device count n and per workload:

  sharding_efficiency(n) = T_unsharded(total work) / T_sharded(n shards)

on identical host resources — >= 0.8 means the sharded program does at
most 25% more work+communication than the ideal, which is the transferable
quantity for ICI-connected chips. Raw wall times are recorded too.

Workloads: data-axis matcher (weak: n pairs over n shards), tile-axis
matcher (strong: one pair's rows over n shards), distributed two-view BA
and M=4 multi-view BA (strong: points over n shards).

Usage:  python tools/scaling_bench.py [--out SCALING.json]
(sets JAX_PLATFORMS=cpu + 8 virtual devices itself; run alone — timings
share 2 physical cores)
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))



def _git_hash():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True).stdout.strip()
    except OSError:
        return "unknown"

def _bench(fn, reps=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--max-disparity", type=int, default=48)
    ap.add_argument("--ba-points", type=int, default=16384,
                    help="BA point count (large enough that per-shard "
                         "compute dominates the 42-float psum)")
    ap.add_argument("--mv-points", type=int, default=32768)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stereo_reconstruction_tpu.config import (
        BundleAdjustmentConfig, MatcherConfig,
    )
    from stereo_reconstruction_tpu.ops import geometry as geo
    from stereo_reconstruction_tpu.ops.block_search import block_search_right
    from stereo_reconstruction_tpu.parallel import (
        distributed_bundle_adjust, make_mesh, sharded_block_search_right,
    )
    from stereo_reconstruction_tpu.parallel.ba_multiview import (
        distributed_multiview_bundle_adjust, multiview_bundle_adjust,
    )
    from stereo_reconstruction_tpu.pose.ba import bundle_adjust

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    h, w, D = args.h, args.w, args.max_disparity
    cfg = MatcherConfig(block_size=17, min_disparity=0, max_disparity=D,
                        smooth_factor=0.9)

    def make_pairs(b):
        left = rng.integers(1, 255, (b, h, w, 3)).astype(np.float32)
        right = np.roll(left, -6, axis=2)
        right[:, :, :2] = 0
        return jnp.asarray(left), jnp.asarray(right)

    report = {
        "devices": n_dev,
        "physical_cores": os.cpu_count(),
        "workload": {"h": h, "w": w, "D": D,
             "ba_points": args.ba_points, "mv_points": args.mv_points},
        "data_axis": {}, "tile_axis": {}, "ba": {}, "ba_multiview": {},
    }
    counts = [n for n in (1, 2, 4, 8) if n <= n_dev]

    # ---- data axis: n pairs over n shards (weak scaling) ----
    for n in counts:
        L, R = make_pairs(n)
        # unsharded equivalent: same n-pair batch, plain vmap (1 device)
        f_base = jax.jit(jax.vmap(lambda a, b: block_search_right(a, b, cfg)))
        t_base = _bench(lambda: f_base(L, R), reps=args.reps)
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: sharded_block_search_right(L, R, mesh, cfg), reps=args.reps
        )
        report["data_axis"][n] = {
            "t_unsharded_s": round(t_base, 4),
            "t_sharded_s": round(t_shard, 4),
            "sharding_efficiency": round(t_base / t_shard, 4),
        }
        print(f"data axis n={n}: unsharded {t_base:.3f}s sharded {t_shard:.3f}s "
              f"eff {t_base/t_shard:.2%}", flush=True)

    # ---- tile axis: one pair's rows over n shards (strong scaling) ----
    L1, R1 = make_pairs(1)
    f_single = jax.jit(lambda a, b: block_search_right(a, b, cfg))
    t_single = _bench(lambda: f_single(L1[0], R1[0]), reps=args.reps)
    for n in counts:
        mesh = make_mesh(data=1, tile=n, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: sharded_block_search_right(L1, R1, mesh, cfg),
            reps=args.reps,
        )
        report["tile_axis"][n] = {
            "t_single_s": round(t_single, 4),
            "t_sharded_s": round(t_shard, 4),
            "sharding_efficiency": round(t_single / t_shard, 4),
        }
        print(f"tile axis n={n}: single {t_single:.3f}s sharded {t_shard:.3f}s "
              f"eff {t_single/t_shard:.2%}", flush=True)

    # ---- distributed BA: points over n shards ----
    n_pts = args.ba_points
    K = jnp.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
    aa = jnp.array([0.03, -0.05, 0.02])
    Rm = geo.angle_axis_to_rotation(aa)
    T = jnp.array([-0.6, 0.05, 0.2])
    depths = jnp.asarray(rng.uniform(4, 9, n_pts).astype(np.float32))
    xl = jnp.concatenate(
        [jnp.asarray(rng.uniform(-0.25, 0.25, (2, n_pts)).astype(np.float32)),
         jnp.ones((1, n_pts))]
    )
    pts = xl * depths[None, :]
    kp_l = geo.project(K, pts)
    kp_r = geo.project(K, geo.transform(Rm, T, pts))
    bcfg = BundleAdjustmentConfig(max_iterations=15)
    init_R = geo.angle_axis_to_rotation(aa + 0.02)
    init_T = T + 0.05

    t_single = _bench(
        lambda: bundle_adjust(kp_l, kp_r, K, K, init_R, init_T, pts, config=bcfg),
        reps=args.reps,
    )
    for n in counts:
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: distributed_bundle_adjust(
                kp_l, kp_r, K, K, init_R, init_T, pts, mesh, config=bcfg,
            ),
            reps=args.reps,
        )
        report["ba"][n] = {
            "t_single_s": round(t_single, 4),
            "t_sharded_s": round(t_shard, 4),
            "sharding_efficiency": round(t_single / t_shard, 4),
        }
        print(f"BA n={n}: single {t_single:.3f}s sharded {t_shard:.3f}s "
              f"eff {t_single/t_shard:.2%}", flush=True)

    # ---- multi-view BA (M=4) ----
    M = 4
    poses = np.zeros((M, 6), np.float32)
    for m in range(1, M):
        poses[m, :3] = [0, 0.05 * m, 0]
        poses[m, 3:] = [0.4 * m, 0, 0.05 * m]
    poses = jnp.asarray(poses)

    pts_mv = pts[:, :args.mv_points]

    def proj_all(pose6):
        Rmm = geo.angle_axis_to_rotation(pose6[:3])
        return geo.project(K, geo.transform(Rmm, pose6[3:], pts_mv))[:2].T

    obs = jnp.stack([proj_all(poses[m]) for m in range(M)])
    Ks = jnp.stack([K] * M)
    mcfg = BundleAdjustmentConfig(loss="l2", max_iterations=10)
    t_single = _bench(
        lambda: multiview_bundle_adjust(
            obs, Ks, poses, pts_mv.T + 0.02, config=mcfg),
        reps=args.reps,
    )
    for n in counts:
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: distributed_multiview_bundle_adjust(
                obs, Ks, poses, pts_mv.T + 0.02, mesh=mesh, config=mcfg),
            reps=args.reps,
        )
        report["ba_multiview"][n] = {
            "t_single_s": round(t_single, 4),
            "t_sharded_s": round(t_shard, 4),
            "sharding_efficiency": round(t_single / t_shard, 4),
        }
        print(f"MV-BA n={n}: single {t_single:.3f}s sharded {t_shard:.3f}s "
              f"eff {t_single/t_shard:.2%}", flush=True)

    with open(args.out, "w") as f:
        report["git"] = _git_hash()
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
