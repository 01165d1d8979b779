"""Smoothness-reweighted argmin over the cost volume.

The reference interleaves a multiplicative smoothness discount with the
disparity argmin (BlockSearch.cpp:68-79,160-171): while scanning candidates
for pixel (y, x), a candidate's cost is multiplied by ``smoothFactor`` if
the up-neighbor (y-1, x) or left-neighbor (y, x-1) *already chose* that
disparity. This makes the result a sequential recurrence over pixels in
row-major order.

TPU formulation:
  * rows are processed by a ``lax.scan`` (the up-neighbor term is exact:
    each row sees the previous row's final disparities, vectorized over W);
  * the in-row left-neighbor dependence is resolved by ``iters`` Jacobi
    sweeps: sweep k discounts against sweep k-1's left-shifted disparities.
    With iters>=2 this converges to the sequential result except on rare
    propagation chains; the residual disagreement is validated in tests to
    stay within the 0.5pp bad-2.0 budget (SURVEY.md hard-part #1).

Modes:
  * ``"reference"`` — bit-compatible with BlockSearch's Right variant,
    which (sign quirk, BlockSearch.cpp:160-165) compares the neighbor
    disparity against ``-d``; the discount thus fires essentially only at
    d == 0 next to disparity-0 neighbors.
  * ``"intended"``  — compares against ``+d`` (the Left-variant semantics,
    BlockSearch.cpp:68-73, and what the quirk plainly meant to do).
  * ``"none"``      — plain argmin.

No-candidate pixels (all costs +inf) keep the reference sentinel
``minimumCorrespondX = 0``: disparity = -x for the Right variant, +x for
Left. Black pixels are forced to disparity 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("mode", "iters", "variant"))
def smoothed_argmin(
    cost: jnp.ndarray,        # (D, H, W), +inf = invalid candidate
    dvals: jnp.ndarray,       # (D,) disparity value of each plane
    black: jnp.ndarray,       # (H, W) bool: pixels forced to 0
    smooth_factor: float = 0.9,
    mode: str = "reference",
    iters: int = 2,
    variant: str = "right",
) -> jnp.ndarray:
    """Returns the (H, W) float32 disparity map."""
    D, h, w = cost.shape
    dvals = dvals.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    sentinel = -xs if variant == "right" else xs

    sign = -1.0 if mode == "reference" else 1.0

    def discounts(disp_neighbor):
        """(W,) neighbor disparities -> (D, W) multiplicative factors."""
        if mode == "none":
            return jnp.ones((D, w), cost.dtype)
        hit = dvals[:, None] == sign * disp_neighbor[None, :]
        return jnp.where(hit, smooth_factor, 1.0)

    nan_row = jnp.full((w,), jnp.nan, jnp.float32)

    def resolve(cu, left_disp):
        """argmin of the up-discounted cost with left-neighbor discounts."""
        c = cu * discounts(left_disp)
        idx = jnp.argmin(c, axis=0)
        best = jnp.min(c, axis=0)
        disp = jnp.where(jnp.isfinite(best), dvals[idx], sentinel)
        return disp

    def row_step(prev_disp, inputs):
        cost_row, black_row, first = inputs
        # up-discounted cost computed ONCE per row (the Jacobi sweeps only
        # vary the left-neighbor term)
        cu = cost_row * jnp.where(first, 1.0, discounts(prev_disp))

        # sweep 0: no left-neighbor discount (x=0 never has one; interior
        # pixels get it in later sweeps)
        disp = resolve(cu, nan_row)
        for _ in range(max(0, iters - 1)):
            left_disp = jnp.concatenate([nan_row[:1], disp[:-1]])
            disp = resolve(cu, left_disp)

        disp = jnp.where(black_row, 0.0, disp)
        return disp, disp

    first_flags = jnp.zeros((h,), bool).at[0].set(True)
    init = jnp.zeros((w,), jnp.float32)
    _, disparity = lax.scan(
        row_step,
        init,
        (jnp.moveaxis(cost, 1, 0), black, first_flags),
    )
    return disparity


def plain_argmin(cost: jnp.ndarray, dvals: jnp.ndarray, black: jnp.ndarray,
                 variant: str = "right") -> jnp.ndarray:
    """Unsmoothed winner-take-all disparity (cheapest path)."""
    D, h, w = cost.shape
    idx = jnp.argmin(cost, axis=0)
    best = jnp.min(cost, axis=0)
    xs = jnp.arange(w, dtype=jnp.float32)
    sentinel = -xs if variant == "right" else xs
    disp = jnp.where(jnp.isfinite(best), dvals.astype(jnp.float32)[idx], sentinel[None, :])
    return jnp.where(black, 0.0, disp)
