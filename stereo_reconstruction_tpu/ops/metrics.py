"""Disparity evaluation metrics.

``evaldisp`` is the framework's canonical quality metric — a numerically
faithful jnp reimplementation of the reference's Middlebury metric port
(``src/utils.cpp:123-168``): bad-pixel %, invalid %, total-bad %, and
average error against GT disparity + nocc mask. Semantics preserved:

  * GT == +inf pixels are "unknown" and skipped entirely;
  * a prediction is "valid" iff it is != 0;
  * valid predictions are clamped to [0, maxdisp] and optionally rounded;
  * only mask == 255 pixels are evaluated;
  * avgErr averages |d - gt| over valid evaluated pixels only.

Returned as a dict of scalars so it jits/vmaps and reduces with ``psum``
across a sharded batch.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def evaldisp(
    disp: jnp.ndarray,        # (H, W) predicted disparity
    gt_disp: jnp.ndarray,     # (H, W) GT, +inf = unknown
    mask: jnp.ndarray,        # (H, W) uint8 nocc mask, 255 = evaluate
    bad_thresh: float = 2.0,
    max_disp: float = jnp.inf,
    round_disp: bool = False,
) -> Dict[str, jnp.ndarray]:
    disp = disp.astype(jnp.float32)
    gt = gt_disp.astype(jnp.float32)

    known = jnp.isfinite(gt)
    evaluated = known & (mask == 255)

    valid = disp != 0
    d = jnp.clip(disp, 0.0, max_disp)
    if round_disp:
        d = jnp.round(d)
    d = jnp.where(valid, d, disp)

    err = jnp.abs(d - gt)

    n = jnp.sum(evaluated)
    n_valid = jnp.sum(evaluated & valid)
    invalid = n - n_valid
    bad = jnp.sum(evaluated & valid & (err > bad_thresh))
    serr = jnp.sum(jnp.where(evaluated & valid, err, 0.0))

    nf = n.astype(jnp.float32)
    return {
        "n_evaluated": n,
        "coverage_percent": 100.0 * nf / disp.size,
        "bad_percent": 100.0 * bad / nf,
        "invalid_percent": 100.0 * invalid / nf,
        "total_bad_percent": 100.0 * (bad + invalid) / nf,
        "avg_err": serr / jnp.maximum(n_valid, 1).astype(jnp.float32),
    }


def bad_curve(
    disp: jnp.ndarray,
    gt_disp: jnp.ndarray,
    mask: jnp.ndarray,
    thresholds=(0.5, 1.0, 2.0, 4.0),
    max_disp: float = jnp.inf,
) -> Dict[str, jnp.ndarray]:
    """bad-t for the standard Middlebury threshold set."""
    out = {}
    for t in thresholds:
        m = evaldisp(disp, gt_disp, mask, bad_thresh=t, max_disp=max_disp)
        out[f"bad_{t}"] = m["bad_percent"]
    out["avg_err"] = m["avg_err"]
    out["invalid_percent"] = m["invalid_percent"]
    return out


def average_valid_disparity(disp: jnp.ndarray) -> jnp.ndarray:
    """Mean over non-inf entries (reference computeAverageDisparity,
    utils.cpp:8-20)."""
    finite = jnp.isfinite(disp)
    total = jnp.sum(jnp.where(finite, disp, 0.0))
    return total / jnp.maximum(jnp.sum(finite), 1)


def endpoint_error(disp: jnp.ndarray, gt_disp: jnp.ndarray, mask: jnp.ndarray):
    """RMS + mean endpoint error over evaluated pixels (framework extra)."""
    evaluated = jnp.isfinite(gt_disp) & (mask == 255)
    err = jnp.where(evaluated, disp - gt_disp, 0.0)
    n = jnp.maximum(jnp.sum(evaluated), 1).astype(jnp.float32)
    mean = jnp.sum(jnp.abs(err)) / n
    rms = jnp.sqrt(jnp.sum(err * err) / n)
    return {"epe": mean, "rms": rms}
