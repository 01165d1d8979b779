#!/usr/bin/env python3
"""Per-substage device timing of the sparse pose stage (VERDICT r2 weak 4).

The pose stage (pipeline._pose_device: SIFT x2 -> match -> RANSAC ->
filter -> BA) ran at 316 ms/pair on TPU in round 2 with nothing showing
where the time goes. This tool times each substage with the same
relay-dedup-proof method bench.py uses: K steps inside one jit with
perturbed inputs, marginal time = (T_K - T_1) / (K - 1).

Writes baselines/pose_profile.json (git hash + per-substage ms).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--loop", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help=">1: profile the BATCHED pose program "
                         "(pipeline_batch._pose_batch) substage-by-substage "
                         "at this batch width; writes pose_profile_batch.json")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        name = ("pose_profile_batch.json" if args.batch > 1
                else "pose_profile.json")
        args.out = os.path.join(REPO, "baselines", name)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    from jax import lax

    from stereo_reconstruction_tpu.config import PipelineConfig
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair
    from stereo_reconstruction_tpu.ops.features import detect_and_describe
    from stereo_reconstruction_tpu.ops.matching import (
        match_descriptors,
        matches_to_homogeneous,
    )
    from stereo_reconstruction_tpu.pose import ba as ba_mod
    from stereo_reconstruction_tpu.pose.pipeline import estimate_pose_from_matches
    from stereo_reconstruction_tpu.pose.ransac import ransac_eight_point

    cfg = PipelineConfig()
    pair = downsample_pair(MiddEval3("/root/reference/data/MiddEval3").load_training(13))
    img_l = jnp.asarray(pair.image_left, jnp.float32)
    img_r = jnp.asarray(pair.image_right, jnp.float32)
    K_l = jnp.asarray(pair.intrinsics_left)
    K_r = jnp.asarray(pair.intrinsics_right)

    def marginal_ms(make_body, tag):
        """make_body(i) -> scalar float32 that depends on the substage
        output; run K in-jit steps, report marginal per-step ms."""
        def looped(k):
            def body(i, acc):
                return acc + make_body(i)
            return jax.jit(lambda: lax.fori_loop(0, k, body, jnp.float32(0.0)))

        f1, fK = looped(1), looped(args.loop)
        float(f1()); float(fK())        # compile + warm
        t1s, tKs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter(); float(f1()); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(fK()); tKs.append(time.perf_counter() - t0)
        ms = (min(tKs) - min(t1s)) / (args.loop - 1) * 1000
        print(f"{tag:24s} {ms:8.2f} ms")
        return round(ms, 2)

    report = {"image": f"{img_r.shape[0]}x{img_r.shape[1]}",
              "platform": jax.devices()[0].platform, "stages_ms": {}}
    S = report["stages_ms"]

    if args.batch > 1:
        # ---- batched pose profiling (VERDICT r4 weak #8): per-substage
        # marginal ms/pair of the vmapped B-wide programs, same in-jit
        # K-step method. Aims round-5's batched-pose optimization.
        B = args.batch
        report["batch"] = B
        Lb = jnp.stack([img_l] * B) + jnp.arange(B, dtype=jnp.float32)[
            :, None, None, None]                      # distinct lanes
        Rb = jnp.stack([img_r] * B)
        KLb = jnp.stack([K_l] * B)
        KRb = jnp.stack([K_r] * B)

        def per_pair(tag, make_body):
            ms = marginal_ms(make_body, tag)
            S[tag] = round(ms / B, 2)
            print(f"  -> {S[tag]:.2f} ms/pair")

        def vsift(i):
            kp = jax.vmap(lambda im: detect_and_describe(im, cfg.frontend))(
                Lb + 0.25 * (1.0 + i.astype(jnp.float32)))
            return kp.descriptors[:, 0, 0].sum() + kp.xy[:, -1, 0].sum()
        per_pair("sift_one_image", vsift)

        kp_l1 = detect_and_describe(img_l, cfg.frontend)
        kp_r1 = detect_and_describe(img_r, cfg.frontend)
        kpl_b = jax.tree.map(lambda x: jnp.stack([x] * B), kp_l1)
        kpr_b = jax.tree.map(lambda x: jnp.stack([x] * B), kp_r1)

        def vmatch(i):
            eps = 1e-6 * (1.0 + i.astype(jnp.float32))

            def one(kpl, kpr):
                kpl = kpl._replace(descriptors=kpl.descriptors + eps)
                matches = match_descriptors(kpl, kpr, cfg.frontend)
                ml, mr, valid = matches_to_homogeneous(matches)
                order = jnp.argsort(jnp.logical_not(valid), stable=True)
                return ml[0, order[0]] + mr[0, order[-1]]
            return jax.vmap(one)(kpl_b, kpr_b).sum()
        per_pair("match_compact", vmatch)

        matches = match_descriptors(kp_l1, kp_r1, cfg.frontend)
        ml, mr, valid = matches_to_homogeneous(matches)
        order = jnp.argsort(jnp.logical_not(valid), stable=True)
        ml, mr = ml[:, order], mr[:, order]
        n_valid = jnp.sum(valid)
        mlb, mrb = jnp.stack([ml] * B), jnp.stack([mr] * B)
        nvb = jnp.full((B,), n_valid)

        def vransac(i):
            def one(b, mlx, mrx, kl, kr, nv):
                key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.key(0), i), b)
                rr = ransac_eight_point(key, mlx, mrx, kl, kr,
                                        cfg.ransac, nv)
                return rr.pose[0, 0] + rr.mean_error
            return jax.vmap(one)(jnp.arange(B), mlb, mrb, KLb, KRb,
                                 nvb).sum()
        per_pair("ransac", vransac)

        def vfull(i):
            def one(b, mlx, mrx, kl, kr, nv):
                key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.key(0), i), b)
                pe = estimate_pose_from_matches(key, mlx, mrx, kl, kr,
                                                cfg, nv)
                return pe.pose[0, 0] + pe.reproj_error_ba
            return jax.vmap(one)(jnp.arange(B), mlb, mrb, KLb, KRb,
                                 nvb).sum()
        per_pair("pose_from_matches", vfull)
        S["filter_ba_errors"] = round(
            S["pose_from_matches"] - S["ransac"], 2)

        from stereo_reconstruction_tpu.pipeline_batch import _pose_batch
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.key(0), jnp.arange(B))

        def vtotal(i):
            pe = _pose_batch(keys, Lb + 0.25 * (1.0 + i.astype(jnp.float32)),
                             Rb, KLb, KRb, cfg)
            return pe.pose[:, 0, 0].sum() + pe.reproj_error_ba.sum()
        per_pair("pose_device_total", vtotal)
        S["pose_total_est"] = round(2 * S["sift_one_image"]
                                    + S["match_compact"]
                                    + S["pose_from_matches"], 2)

        try:
            report["git"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True).stdout.strip()
        except OSError:
            report["git"] = "unknown"
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report))
        return

    # 1. SIFT detect+describe (one image)
    def sift_body(i):
        kp = detect_and_describe(img_l + 0.25 * (1.0 + i.astype(jnp.float32)),
                                 cfg.frontend)
        return kp.descriptors[0, 0] + kp.xy[-1, 0]
    S["sift_one_image"] = marginal_ms(sift_body, "sift (one image)")

    # 1b. detection only (pyramid + extrema + global top-K); the
    # describe stage (ori/desc gathers on K winners) is the difference
    from stereo_reconstruction_tpu.ops import features as feat

    detect_jit = jax.jit(
        lambda img: feat._detect(img, cfg.frontend))

    def detect_body(i):
        d = detect_jit(img_l + 0.25 * (1.0 + i.astype(jnp.float32)))
        return d["xy"][0, 0] + d["mag"][0, 0, 0] + d["response"][-1]
    S["sift_detect_only"] = marginal_ms(detect_body, "sift detect only")
    S["sift_describe_est"] = round(
        S["sift_one_image"] - S["sift_detect_only"], 2)

    # 1c. pyramid alone (gaussian scale space + DoG)
    pyr_jit = jax.jit(lambda img: feat._build_pyramid(
        feat.rgb_to_gray(img) / 255.0, cfg.frontend))

    def pyr_body(i):
        p = pyr_jit(img_l + 0.25 * (1.0 + i.astype(jnp.float32)))
        return sum(g[0, 0, 0] + d[-1, -1, -1] for g, d, _ in p)
    S["sift_pyramid_only"] = marginal_ms(pyr_body, "sift pyramid only")

    # 1d. the same three under HIGHEST matmul precision — what the fused
    # pose program actually traces (quality-critical, pipeline.py)
    def hp(body):
        def wrapped(i):
            with jax.default_matmul_precision("highest"):
                return body(i)
        return wrapped
    S["sift_one_image_highest"] = marginal_ms(
        hp(sift_body), "sift (highest prec)")
    S["sift_pyramid_highest"] = marginal_ms(
        hp(pyr_body), "pyramid (highest prec)")

    # fixed keypoints for downstream stages
    kp_l = detect_and_describe(img_l, cfg.frontend)
    kp_r = detect_and_describe(img_r, cfg.frontend)

    # 2. descriptor matching + compaction
    def match_body(i):
        eps = 1e-6 * (1.0 + i.astype(jnp.float32))
        kpl = kp_l._replace(descriptors=kp_l.descriptors + eps)
        matches = match_descriptors(kpl, kp_r, cfg.frontend)
        ml, mr, valid = matches_to_homogeneous(matches)
        order = jnp.argsort(jnp.logical_not(valid), stable=True)
        return ml[0, order[0]] + mr[0, order[-1]]
    S["match_compact"] = marginal_ms(match_body, "match + compact")

    matches = match_descriptors(kp_l, kp_r, cfg.frontend)
    ml, mr, valid = matches_to_homogeneous(matches)
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    ml, mr = ml[:, order], mr[:, order]
    n_valid = jnp.sum(valid)

    # 3. RANSAC 8pt
    def ransac_body(i):
        key = jax.random.fold_in(jax.random.key(0), i)
        rr = ransac_eight_point(key, ml, mr, K_l, K_r, cfg.ransac, n_valid)
        return rr.pose[0, 0] + rr.mean_error
    S["ransac"] = marginal_ms(ransac_body, "ransac 8pt")

    # 4. full pose-from-matches (ransac + filter + BA + errors)
    def full_body(i):
        key = jax.random.fold_in(jax.random.key(0), i)
        pe = estimate_pose_from_matches(key, ml, mr, K_l, K_r, cfg, n_valid)
        return pe.pose[0, 0] + pe.reproj_error_ba
    S["pose_from_matches"] = marginal_ms(full_body, "pose-from-matches")
    S["filter_ba_errors"] = round(S["pose_from_matches"] - S["ransac"], 2)

    # 5. BA alone on the same support size
    m = cfg.ba.num_points
    rngn = np.random.default_rng(0)
    depths = jnp.asarray(rngn.uniform(4, 9, m), jnp.float32)
    xl = jnp.concatenate([jnp.asarray(rngn.uniform(-0.25, 0.25, (2, m)), jnp.float32),
                          jnp.ones((1, m))])
    pts = xl * depths[None, :]
    from stereo_reconstruction_tpu.ops import geometry as geo
    R0 = geo.angle_axis_to_rotation(jnp.array([0.02, -0.03, 0.01]))
    T0 = jnp.array([-0.5, 0.02, 0.1])
    kpl_s = geo.project(K_l, pts)
    kpr_s = geo.project(K_r, geo.transform(R0, T0, pts))

    def ba_body(i):
        eps = 1e-4 * (1.0 + i.astype(jnp.float32))
        res = ba_mod.bundle_adjust(kpl_s + eps, kpr_s, K_l, K_r, R0, T0,
                                   pts, config=cfg.ba)
        return res.pose[0, 0] + res.final_cost
    S["ba_alone"] = marginal_ms(ba_body, "BA alone")

    # 6. the REAL pose stage end-to-end (pipeline._pose_device: vmapped
    # pair SIFT -> match -> compact -> RANSAC -> filter -> BA)
    from stereo_reconstruction_tpu.pipeline import _pose_device

    def pose_device_body(i):
        key = jax.random.fold_in(jax.random.key(0), i)
        pe = _pose_device(key, img_l + 0.25 * (1.0 + i.astype(jnp.float32)),
                          img_r, K_l, K_r, cfg)
        return pe.pose[0, 0] + pe.reproj_error_ba
    S["pose_device_total"] = marginal_ms(pose_device_body, "pose device total")

    S["pose_total_est"] = round(2 * S["sift_one_image"] + S["match_compact"]
                                + S["pose_from_matches"], 2)
    try:
        report["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip()
    except OSError:
        report["git"] = "unknown"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
