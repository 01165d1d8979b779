#!/usr/bin/env python3
"""Perceptual window search AT IMAGE SCALE on TPU (VERDICT r3 item 3).

The crop parity run (tools/perceptual_parity.py) proves the windowed
backend's notebook-exactness; this tool proves its PERFORMANCE at real
size: Teddy trainingQ (375 x 450), D = 100, both perceptual modes timed
on the TPU, against the literal notebook oracle's measured per-row CPU
cost extrapolated to the full image (the oracle is the reference's own
execution model — a Python row loop of per-window VGG forwards,
notebook cells 6-10; running every row would take hours, and the
recurrence only looks upward, so a prefix run is exact for its rows).

Records into baselines/perceptual_parity.json under "image_scale":
  * windowed_tpu_s / full_image_tpu_s — steady-state per-image seconds
    (min over input-perturbed reps; the axon relay dedupes identical
    executions, so inputs vary per rep);
  * oracle_row_s / oracle_extrapolated_s — measured oracle per-row cost
    (compile excluded) x H;
  * speedup_vs_oracle + the VERDICT criterion windowed <= oracle x 0.1;
  * prefix_agreement_pct — windowed-TPU vs oracle on the oracle's rows
    (cross-backend conv numerics may flip rare argmin ties; the
    exactness GATE stays the same-backend crop test,
    tests/test_perceptual.py).

Usage: python tools/perceptual_scale.py          (TPU via default env)
       --oracle-child is internal (CPU subprocess).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

DATA_ROOT = "/root/reference/data/MiddEval3"
D = 100
ORACLE_ROWS = 6


def _load_pair():
    from stereo_reconstruction_tpu.data import MiddEval3
    from stereo_reconstruction_tpu.data.middeval3 import downsample_pair

    pair = downsample_pair(MiddEval3(DATA_ROOT).load_training(13))  # Teddy Q
    L = np.asarray(pair.image_left, np.float32)
    R = np.asarray(pair.image_right, np.float32)
    return L, R


def oracle_child(n_rows: int, out_path: str,
                 scattered_npz: str = "") -> None:
    """CPU subprocess: oracle prefix rows + per-row timing; optionally
    also scattered rows conditioned on a provided disparity context
    (VERDICT r4 #6 — see notebook_oracle.notebook_rows)."""
    from stereo_reconstruction_tpu.perceptual import get_params
    from stereo_reconstruction_tpu.perceptual.notebook_oracle import (
        notebook_rows,
        notebook_window_search,
    )

    L, R = _load_pair()
    params = get_params()
    t0 = time.time()
    notebook_window_search(params, L, R, max_disparity=D, n_rows=1)
    t_first = time.time() - t0                       # compile + row 0
    t0 = time.time()
    rows = notebook_window_search(params, L, R, max_disparity=D,
                                  n_rows=n_rows)
    t_n = time.time() - t0
    # the first (n_rows=1) call compiled the row programs, so t_n is all
    # warm row work
    per_row = t_n / n_rows
    extra = {}
    if scattered_npz:
        ctx = np.load(scattered_npz)
        ys = ctx["rows_y"]
        scat = notebook_rows(params, L, R, [int(y) for y in ys],
                             ctx["disparity"], max_disparity=D)
        extra = {"scattered_y": ys,
                 "scattered_rows": np.stack([scat[int(y)] for y in ys])}
    np.savez(out_path, rows=rows[:n_rows], per_row_marginal_s=per_row,
             t_first_s=t_first, t_n_s=t_n, **extra)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle-child", type=int, default=None)
    ap.add_argument("--out", default="")
    ap.add_argument("--rows", type=int, default=ORACLE_ROWS)
    ap.add_argument("--scattered", type=int, default=8,
                    help="scattered rows verified against the oracle "
                         "conditioned on the backend's own previous row "
                         "(0 disables)")
    ap.add_argument("--scattered-ctx", default="",
                    help="(oracle-child internal) npz with disparity "
                         "context + rows_y")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    if args.oracle_child is not None:
        oracle_child(args.oracle_child, args.out, args.scattered_ctx)
        return

    import jax
    import jax.numpy as jnp

    from stereo_reconstruction_tpu.config import PerceptualConfig
    from stereo_reconstruction_tpu.perceptual import (
        get_params,
        perceptual_window_search,
    )

    L, R = _load_pair()
    h, w = R.shape[:2]
    params = get_params()
    platform = jax.devices()[0].platform
    results = {"scene": f"Teddy trainingQ full image {h}x{w}",
               "max_disparity": D, "platform": platform}

    disp_by_mode = {}
    for mode in ("windowed", "full_image"):
        cfg = PerceptualConfig(max_disparity=D, mode=mode)
        t0 = time.time()
        disp = np.asarray(perceptual_window_search(
            params, jnp.asarray(L), jnp.asarray(R), cfg))
        compile_s = time.time() - t0
        best = np.inf
        for k in range(1, args.reps + 1):
            t0 = time.time()
            out = perceptual_window_search(
                params, jnp.asarray(L + k), jnp.asarray(R + k), cfg)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        disp_by_mode[mode] = disp
        results[f"{mode}_tpu_s"] = round(best, 2)
        results[f"{mode}_compile_s"] = round(compile_s, 1)
        print(f"{mode}: {best:.2f}s/image (compile {compile_s:.0f}s)",
              flush=True)

    if not args.skip_oracle:
        out_npz = "/tmp/stpu_oracle_prefix.npz"
        env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--oracle-child", str(args.rows), "--out", out_npz]
        wd = disp_by_mode["windowed"]
        if args.scattered:
            # scattered verification rows (VERDICT r4 #6): half evenly
            # spread below the prefix, half from the highest-disparity
            # bands (where the smoothing recurrence works hardest), each
            # oracle-computed from the BACKEND's own row y-1 context
            even = np.linspace(args.rows + 5, h - 2,
                               args.scattered // 2).astype(int)
            chosen = [int(y) for y in even]
            for y in np.argsort(-wd.mean(axis=1)):
                if len(chosen) >= args.scattered:
                    break
                if y >= 1 and all(abs(int(y) - c) > 2 for c in chosen):
                    chosen.append(int(y))
            ys = np.asarray(sorted(set(chosen))[:args.scattered])
            ctx_npz = "/tmp/stpu_scatter_ctx.npz"
            np.savez(ctx_npz, disparity=wd, rows_y=ys)
            cmd += ["--scattered-ctx", ctx_npz]
        subprocess.run(cmd, check=True, env=env, cwd=REPO, timeout=7200)
        data = np.load(out_npz)
        per_row = float(data["per_row_marginal_s"])
        oracle_rows = data["rows"]
        agree = float((wd[:args.rows] == oracle_rows).mean())
        results.update({
            "oracle_rows_measured": args.rows,
            "oracle_row_s": round(per_row, 2),
            "oracle_extrapolated_s": round(per_row * h, 1),
            "windowed_speedup_vs_oracle": round(
                per_row * h / results["windowed_tpu_s"], 1),
            "windowed_leq_oracle_x0.1": bool(
                results["windowed_tpu_s"] <= 0.1 * per_row * h),
            "prefix_agreement_pct": round(100.0 * agree, 2),
        })
        if "scattered_rows" in data:
            ys = data["scattered_y"]
            srows = data["scattered_rows"]
            per_row_agree = [float((wd[int(y)] == srows[i]).mean())
                             for i, y in enumerate(ys)]
            results.update({
                "scattered_rows_y": [int(y) for y in ys],
                "scattered_row_agreement_pct": [
                    round(100.0 * a, 2) for a in per_row_agree],
                "scattered_agreement_pct": round(
                    100.0 * float(np.mean(per_row_agree)), 2),
                "oracle_rows_measured": args.rows + len(ys),
            })

    # merge into the parity baseline
    path = os.path.join(REPO, "baselines", "perceptual_parity.json")
    with open(path) as f:
        report = json.load(f)
    report["image_scale"] = results
    try:
        report["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip()
    except OSError:
        pass
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
