#!/usr/bin/env python3
"""Sharding-overhead bench on the virtual N-device CPU mesh.

Real multi-chip hardware is not reachable from this environment (one TPU
chip behind a relay), so what can be measured honestly on a 2-core host
whose N virtual devices time-slice is NOT speedup — it is the overhead
the sharded program adds over the identical computation without
partitioning: SPMD partitioning, halo exchanges (ppermute), reductions
(psum), and redundant warm-up work.

Methodology (VERDICT r2 item 5):
  * the baseline for every workload is THE SAME shard_map entry point on
    a 1-device mesh — identical code path and scheduling, so the ratio
    isolates partitioning/collective overhead instead of comparing two
    differently-scheduled programs;
  * both sides process the SAME TOTAL WORK on the same host resources
    (the data-axis "weak" workload batches n pairs on both sides);
  * reported efficiency is capped at 1.0 — a ratio above 1 on a
    time-sliced host is an XLA scheduling artifact, not scaling evidence
    (the raw ratio is recorded separately);
  * true cross-process scaling lives in tools/multihost_bench.py
    (jax.distributed + Gloo, core-pinned); its numbers are the ones to
    quote for "2+ hosts".

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


def _row(t_base, t_shard):
    raw = t_base / t_shard
    return {
        "t_mesh1_s": round(t_base, 4),
        "t_sharded_s": round(t_shard, 4),
        "overhead_efficiency": round(min(1.0, raw), 4),
        "raw_ratio": round(raw, 4),
    }


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
    from stereo_reconstruction_tpu.parallel import (
        distributed_bundle_adjust, make_mesh, sharded_block_search_right,
    )
    from stereo_reconstruction_tpu.parallel.ba_multiview import (
        distributed_multiview_bundle_adjust,
    )

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
        "metric": "overhead_efficiency = T(same program, 1-device mesh, "
                  "same total work) / T(sharded, n devices); capped at 1.0 "
                  "(time-sliced virtual devices cannot evidence speedup); "
                  "see MULTIHOST.json for true cross-process scaling",
        "devices": n_dev,
        "physical_cores": os.cpu_count(),
        "workload": {"h": h, "w": w, "D": D,
                     "ba_points": args.ba_points, "mv_points": args.mv_points},
        "data_axis": {}, "tile_axis": {}, "ba": {}, "ba_multiview": {},
    }
    counts = [n for n in (2, 4, 8) if n <= n_dev]
    mesh1 = make_mesh(data=1, tile=1, devices=jax.devices()[:1])

    # ---- data axis: n pairs, n shards vs the SAME program on 1 device ----
    for n in counts:
        L, R = make_pairs(n)
        t_base = _bench(
            lambda: sharded_block_search_right(L, R, mesh1, cfg),
            reps=args.reps)
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: sharded_block_search_right(L, R, mesh, cfg),
            reps=args.reps)
        report["data_axis"][n] = _row(t_base, t_shard)
        print(f"data axis n={n}: mesh1 {t_base:.3f}s sharded {t_shard:.3f}s "
              f"eff {report['data_axis'][n]['overhead_efficiency']:.2%}",
              flush=True)

    # ---- tile axis: one pair's rows over n shards ----
    # median-of-3 measurement rounds (VERDICT r4 #10): the tile rows are
    # the shortest programs here (~65 ms) and the only ones whose margin
    # over the 0.8 gate is small — on a 2-core host time-slicing n
    # virtual devices, one scheduler hiccup in a single round moved the
    # n=4 ratio by ~0.1. The structural overhead itself is the per-shard
    # halo warm-up rows (2*hbs recomputed rows per tile boundary: ~6% of
    # 64-row shards at n=4), which the wavefront-exact mode bounds.
    L1, R1 = make_pairs(1)
    t_base = _bench(
        lambda: sharded_block_search_right(L1, R1, mesh1, cfg),
        reps=args.reps)
    for n in counts:
        mesh = make_mesh(data=1, tile=n, devices=jax.devices()[:n])
        shard_rounds = sorted(
            _bench(lambda: sharded_block_search_right(L1, R1, mesh, cfg),
                   reps=args.reps)
            for _ in range(3))
        t_shard = shard_rounds[1]                      # median round
        report["tile_axis"][n] = _row(t_base, t_shard)
        report["tile_axis"][n]["shard_rounds_s"] = [
            round(t, 4) for t in shard_rounds]
        print(f"tile axis n={n}: mesh1 {t_base:.3f}s sharded {t_shard:.3f}s "
              f"(rounds {shard_rounds}) "
              f"eff {report['tile_axis'][n]['overhead_efficiency']:.2%}",
              flush=True)

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

    t_base = _bench(
        lambda: distributed_bundle_adjust(
            kp_l, kp_r, K, K, init_R, init_T, pts, mesh1, config=bcfg),
        reps=args.reps)
    for n in counts:
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: distributed_bundle_adjust(
                kp_l, kp_r, K, K, init_R, init_T, pts, mesh, config=bcfg),
            reps=args.reps)
        report["ba"][n] = _row(t_base, t_shard)
        print(f"BA n={n}: mesh1 {t_base:.3f}s sharded {t_shard:.3f}s "
              f"eff {report['ba'][n]['overhead_efficiency']:.2%}", flush=True)

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
    t_base = _bench(
        lambda: distributed_multiview_bundle_adjust(
            obs, Ks, poses, pts_mv.T + 0.02, mesh=mesh1, config=mcfg),
        reps=args.reps)
    for n in counts:
        mesh = make_mesh(data=n, tile=1, devices=jax.devices()[:n])
        t_shard = _bench(
            lambda: distributed_multiview_bundle_adjust(
                obs, Ks, poses, pts_mv.T + 0.02, mesh=mesh, config=mcfg),
            reps=args.reps)
        report["ba_multiview"][n] = _row(t_base, t_shard)
        print(f"MV-BA n={n}: mesh1 {t_base:.3f}s sharded {t_shard:.3f}s "
              f"eff {report['ba_multiview'][n]['overhead_efficiency']:.2%}",
              flush=True)

    with open(args.out, "w") as f:
        report["git"] = _git_hash()
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
