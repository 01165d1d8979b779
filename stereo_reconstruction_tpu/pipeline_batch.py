"""Batched end-to-end pipeline: B pairs as two device programs.

``run_pair`` (pipeline.py) reproduces the reference ``main()`` flow
(src/main.cpp:13-66) one pair at a time with a host round-trip per
stage; at round-2 it ran at 1.78 pairs/s on TPU — the matcher beat its
target 13.8x while the pipeline around it stayed host-bound (VERDICT r2
item 2). This module batches the whole flow over B pairs:

  device program 1  (_pose_batch):   vmapped sparse-pose stage
                                     (SIFT x2 -> match -> RANSAC -> BA)
  host              (tiny f64 math): Loop-Zhang homographies per pair
                                     (3x3 matrices; microseconds each)
  device program 2  (_dense_batch):  vmapped warp -> dense matcher ->
                                     disparity back-warp -> outlier clamp
                                     -> depth

Two host->device round-trips per BATCH instead of four per PAIR, and
every stage runs at batch width on the MXU.

Failure masking (SURVEY §5): pairs whose pose is degenerate fall back to
matching the raw pair inside the SAME batched program — their
homographies are replaced by identity, so the warp is a zero-padded copy
(MiddEval3 pairs are row-aligned already). This mirrors run_pair's
fallback up to the static canvas padding (documented deviation: near the
right edge the canvas's black padding stands in for out-of-image
candidates, exactly as it does on the rectified path).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stereo_reconstruction_tpu.config import PipelineConfig
from stereo_reconstruction_tpu.data.records import StereoPair, pad_to
from stereo_reconstruction_tpu.ops import metrics as metrics_mod
from stereo_reconstruction_tpu.ops.block_search import block_search_right
from stereo_reconstruction_tpu.ops.warp import warp_band, warp_perspective
from stereo_reconstruction_tpu.pipeline import _pose_device
from stereo_reconstruction_tpu.recon.disparity import (
    disparity_to_depth,
    remove_disparity_outliers,
)
from stereo_reconstruction_tpu.rectify.loop_zhang import loop_zhang_homographies
from stereo_reconstruction_tpu.rectify.rectifier import static_canvas


@dataclasses.dataclass
class BatchResult:
    disparity: np.ndarray          # (B, H, W) original-frame right disparity
    depth: np.ndarray              # (B, H, W)
    pose: object                   # vmapped PoseEstimate (leaves have B dim)
    pose_ok: np.ndarray            # (B,) bool — valid pose used for rectify
    metrics: List[Dict[str, float]]
    timings: Dict[str, float]


@functools.partial(jax.jit, static_argnames=("config",))
def _pose_batch(keys, left, right, K_left, K_right, config: PipelineConfig):
    return jax.vmap(
        lambda k, l, r, kl, kr: _pose_device(k, l, r, kl, kr, config)
    )(keys, left, right, K_left, K_right)


@functools.partial(jax.jit, static_argnames=("config", "canvas", "out_shape",
                                             "band"))
def _dense_batch(left, right, H_left, H_right, K_right, pose_ok,
                 config: PipelineConfig, canvas, out_shape, band=None):
    eye = jnp.eye(3, dtype=jnp.float32)

    def warp(img, h, shape, method):
        # band = (dy, dx) static budget covering every pair in the batch:
        # the gather-free shift-and-accumulate warp (ops/warp.py
        # warp_band — TPU gathers cost ~2.6x the matcher itself);
        # None -> general gather warp
        if band is None:
            return warp_perspective(img, h, shape, method=method)
        return warp_band(img, h, shape, band[0], band[1], method=method)

    def one(l, r, hl, hr, k, ok):
        hl = jnp.where(ok, hl, eye)
        hr = jnp.where(ok, hr, eye)
        rect_l = warp(l, hl, canvas, "bilinear")
        rect_r = warp(r, hr, canvas, "bilinear")
        disp_rect = block_search_right(rect_l, rect_r, config.matcher)
        # NN back-warp of disparity VALUES (the reference's approximation,
        # rectification.cpp:70-88, corrected to the right-image H)
        disp = warp(disp_rect, jnp.linalg.inv(hr), out_shape, "nearest")
        disp_clean = remove_disparity_outliers(
            disp, config.recon.outlier_kernel,
            config.recon.outlier_front, config.recon.outlier_back)
        depth = disparity_to_depth(disp_clean, k[0, 0], config.recon.baseline)
        return disp, depth

    return jax.vmap(one)(left, right, H_left, H_right, K_right, pose_ok)


@jax.jit
def _evaldisp_batch(disp, gt, mask, max_disp):
    return jax.vmap(
        lambda d, g, m, x: metrics_mod.evaldisp(d, g, m, 2.0, x)
    )(disp, gt, mask, max_disp)


def run_batch(
    pairs: Sequence[StereoPair],
    config: PipelineConfig = PipelineConfig(),
    key: Optional[jax.Array] = None,
    mesh=None,
) -> BatchResult:
    """Full reconstruction of a batch of stereo pairs (reference main.cpp
    flow, batched; see module docstring).

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"data"`` axis shards the
    batch across devices — both device programs are vmapped over B, so
    XLA SPMD-partitions them along the batch dimension with no
    cross-pair collectives (the pairs are independent until the metric
    reduce). B must be a multiple of the axis size.
    """
    timings: Dict[str, float] = {}
    B = len(pairs)
    hmax = max(p.height for p in pairs)
    wmax = max(p.width for p in pairs)
    hmax += (-hmax) % 8
    wmax += (-wmax) % 128
    padded = [pad_to(p, hmax, wmax) for p in pairs]

    L = jnp.stack([jnp.asarray(p.image_left) for p in padded])
    R = jnp.stack([jnp.asarray(p.image_right) for p in padded])
    KL = jnp.stack([jnp.asarray(p.intrinsics_left) for p in padded])
    KR = jnp.stack([jnp.asarray(p.intrinsics_right) for p in padded])
    key = jax.random.key(config.seed) if key is None else key
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(B))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(x, rank):
            spec = P(*(("data",) + (None,) * (rank - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        L, R = shard(L, 4), shard(R, 4)
        KL, KR = shard(KL, 3), shard(KR, 3)
        keys = shard(keys, 1)

    t0 = time.perf_counter()
    pose = _pose_batch(keys, L, R, KL, KR, config)
    F_all = np.asarray(pose.fundamental, np.float64)        # one readback
    valid = np.asarray(pose.valid)
    err_ba = np.asarray(pose.reproj_error_ba)
    timings["pose"] = time.perf_counter() - t0

    # host: Loop-Zhang per pair — 3x3 f64 math (microseconds per pair)
    t0 = time.perf_counter()
    pose_ok = valid & (err_ba < 50.0)
    Hl = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    Hr = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    for i in range(B):
        if pose_ok[i]:
            try:
                # the pair's TRUE shape, not the batch padding: the
                # shearing stage normalizes by the image corners, and the
                # back-warp resamples disparity VALUES — a wrong canvas
                # scale would rescale every disparity
                homs = loop_zhang_homographies(
                    F_all[i],
                    (pairs[i].height, pairs[i].width),
                    (pairs[i].height, pairs[i].width))
                Hl[i] = homs.H_left.astype(np.float32)
                Hr[i] = homs.H_right.astype(np.float32)
            except Exception:
                pose_ok[i] = False                          # degenerate F
    timings["loop_zhang_host"] = time.perf_counter() - t0

    canvas = static_canvas((hmax, wmax), (hmax, wmax), config.rectify)

    # static warp-band budget covering all three warps of every pair
    # (see _dense_batch.warp); any pair exceeding the largest class
    # drops the whole batch to the gather warp
    from stereo_reconstruction_tpu.ops.warp import band_budget

    budgets = []
    for i in range(B):
        if not pose_ok[i]:
            continue
        budgets.append(band_budget(Hl[i], canvas, (hmax, wmax)))
        budgets.append(band_budget(Hr[i], canvas, (hmax, wmax)))
        budgets.append(band_budget(
            np.linalg.inv(np.asarray(Hr[i], np.float64)),
            (hmax, wmax), canvas))
    if budgets and all(b is not None for b in budgets):
        band = (max(b[0] for b in budgets), max(b[1] for b in budgets))
    elif budgets:
        band = None
    else:
        band = (2, 2)                                   # all-identity batch

    t0 = time.perf_counter()
    disp, depth = _dense_batch(
        L, R, jnp.asarray(Hl), jnp.asarray(Hr), KR,
        jnp.asarray(pose_ok), config, canvas, (hmax, wmax), band)
    disp_np, depth_np = jax.device_get((disp, depth))   # one transfer
    timings["dense"] = time.perf_counter() - t0

    metrics: List[Dict[str, float]] = [
        {"pose_ok": float(pose_ok[i]), "reproj_error_ba": float(err_ba[i])}
        for i in range(B)
    ]
    # score every pair with GT in ONE vmapped device call (a per-pair
    # evaldisp dispatch costs a full relay round-trip each)
    have_gt = [i for i, p in enumerate(padded)
               if p.disp_right_gt is not None and p.mask_right_nocc is not None]
    if have_gt:
        ev = _evaldisp_batch(
            jnp.asarray(disp_np[have_gt]),
            jnp.stack([jnp.asarray(padded[i].disp_right_gt) for i in have_gt]),
            jnp.stack([jnp.asarray(padded[i].mask_right_nocc) for i in have_gt]),
            jnp.asarray([float(pairs[i].ndisp or 1e9) for i in have_gt],
                        jnp.float32),
        )
        ev = {k: np.asarray(v) for k, v in ev.items()}
        for j, i in enumerate(have_gt):
            metrics[i].update({k: float(v[j]) for k, v in ev.items()})

    return BatchResult(
        disparity=disp_np,
        depth=depth_np,
        pose=pose,
        pose_ok=pose_ok,
        metrics=metrics,
        timings=timings,
    )
