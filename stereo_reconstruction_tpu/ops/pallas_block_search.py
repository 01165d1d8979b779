"""Fused Pallas TPU kernel for the dense block search.

The XLA path (ops/cost_volume.py + ops/smoothing.py) materializes the
(D, H, W) cost volume in HBM — ~1.1 GB of traffic per half-res pair. This
kernel fuses the whole BlockSearch Right-variant pipeline
(BlockSearch.cpp:88-179 semantics) into ONE `pallas_call` that never
leaves VMEM:

  grid = (W_tiles, H + hbs - 1)  # row-sequential inner dimension

  Per step (wt, s) the kernel
    1. receives one image row (auto-pipelined BlockSpec DMA: left row s,
       right row s, and right row y = s - (hw-1) for the black-pixel mask),
    2. computes the per-candidate x-windowed squared-diff row
       rowx[d, x] = sum_{dx in [x-hbs, x+hbs) ∩ [0, W-1)} dsq_d(s, dx)
       and pushes it into a 16-slot VMEM ring buffer,
    3. assembles the full window cost for output row y = s - (hw-1) by a
       slot-masked reduction over the ring (masking reproduces the
       reference's clipped [0, H-1) window rows exactly),
    4. applies the smoothness discounts — the up-neighbor term against the
       previous row's disparities (VMEM carry) and the in-row left-neighbor
       term via Jacobi sweeps, with cross-tile boundary handoff — and
       writes the argmin disparity row.

  TPU grid execution is sequential, which is exactly what the row
  recurrence needs; VMEM scratch persists across grid steps.

HBM traffic: images read once + disparity written once — the kernel is
bandwidth-optimal up to the row pipeline. VMEM: ring (hw, D, TW) f32 is
the budget driver (6.5 MB at D=200, TW=512).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_reconstruction_tpu.config import MatcherConfig


def _kernel(
    # scalar prefetch
    dims_ref,            # SMEM (8,): [H, W, WL, D, min_d, hw, n_wt, smooth_sign]
    # inputs (auto-pipelined row blocks)
    left_ref,            # (3, 1, WLp) row s of the left image
    right_ref,           # (3, 1, Wp)  row s of the right image
    right_y_ref,         # (3, 1, Wp)  row y = s - (hw-1) of the right image
    # output
    disp_ref,            # (8, TW) disparity rows [8*(y//8), ...), tile wt
    # scratch
    ring_ref,            # (hw, D, TW) f32 ring of x-windowed dsq rows
    prev_disp_ref,       # (1, TW) f32 previous output row's disparities
    boundary_ref,        # (1, Hpad) f32 right-edge disparities of prev tile
    *,
    TW: int,
    D: int,
    hw: int,             # window span = 2*hbs (16 for block 17)
    hbs: int,
    min_d: int,
    smooth_factor: float,
    smooth_mode: str,    # "reference" | "intended" | "none"
    jacobi_iters: int,
    H: int,
    W: int,
    WL: int,
    WLp: int,
    Wp: int,
):
    wt = pl.program_id(0)
    s = pl.program_id(1)
    # emit row y once its newest window row (y + hbs - 1) is in the ring
    y = s - (hbs - 1)
    x0 = wt * TW

    f32 = jnp.float32

    # ------------------------------------------------------------------
    # 1) compute rowx for image row r = s and store in ring slot s % hw
    # ------------------------------------------------------------------
    @pl.when(s < H - 1)          # the last row never participates in windows
    def _fill_ring():
        # inputs are pre-padded host-side by hbs on the left (the left
        # image additionally pre-shifted by min_d), so padded index =
        # global column + hbs; all dynamic lane starts below are 128-
        # aligned (Mosaic requires statically provable alignment):
        # x0 = wt*TW with TW % 128 == 0, chunk bases add multiples of 128.
        # dsq lives at global columns [x0-hbs, x0+TW+hbs); columns < 0 or
        # >= W-1 contribute zero (reference last-col clip).
        x0a = pl.multiple_of(x0, 128)
        rslice = right_ref[0, :, pl.ds(x0a, TW + hw)]       # (3, TW+hw)
        col_ids = x0 - hbs + lax.broadcasted_iota(jnp.int32, (1, TW + hw), 1)
        col_ok = (col_ids >= 0) & (col_ids < W - 1)

        # disparities in aligned chunks of 128: one aligned load per chunk,
        # then 128 static in-register shifts (fully unrolled)
        for dc in range(0, D, 128):
            ls_chunk = left_ref[
                0, :, pl.ds(pl.multiple_of(x0a + dc, 128), TW + hw + 128)
            ]                                               # (3, TW+hw+128)
            for j in range(min(128, D - dc)):
                ls = ls_chunk[:, j : j + TW + hw]
                diff = ls - rslice
                dsq = jnp.sum(diff * diff, axis=0, keepdims=True)
                dsq = jnp.where(col_ok, dsq, 0.0)
                # x-window sliding sum of width hw (static shifts):
                # out[x] = sum_k dsq[x - hbs + k] for x in [x0, x0+TW)
                acc = jnp.zeros((1, TW), f32)
                for k in range(hw):
                    acc = acc + dsq[:, k : k + TW]
                ring_ref[s % hw, dc + j, :] = acc[0]

    # ------------------------------------------------------------------
    # 2) assemble + resolve output row y (when it exists)
    # ------------------------------------------------------------------
    @pl.when((y >= 0) & (y < H))
    def _emit_row():
        # slot k holds image row r(k) = s - ((s - k) mod hw); weight it by
        # whether r(k) lies in the clipped window [max(y-hbs,0), min(y+hbs, H-1))
        win = jnp.zeros((D, TW), f32)
        for k in range(hw):
            # r = s - ((s - k) % hw); static k, dynamic s
            r = s - jnp.remainder(s - k, hw)
            ok = (r >= jnp.maximum(y - hbs, 0)) & (r < jnp.minimum(y + hbs, H - 1))
            # where() (not mask-multiply): unwritten slots hold NaN
            win = win + jnp.where(ok, ring_ref[k, :, :], 0.0)

        # per-pixel clipped geometry (global coords)
        xg = x0 + lax.broadcasted_iota(jnp.int32, (1, TW), 1)     # (1, TW)
        lft = jnp.minimum(xg, hbs)
        rgt = jnp.minimum(W - 1 - xg, hbs)
        up = jnp.minimum(y, hbs)
        down = jnp.minimum(H - 1 - y, hbs)
        area = ((lft + rgt) * (up + down)).astype(f32)            # (1, TW)
        inv_area = jnp.where(area > 0, 1.0 / jnp.maximum(area, 1.0), jnp.inf)

        cost = jnp.sqrt(jnp.maximum(win, 0.0)) * inv_area          # (D, TW)
        dvals = (min_d + lax.broadcasted_iota(jnp.int32, (D, 1), 0)).astype(f32)
        valid = (xg + (min_d + lax.broadcasted_iota(jnp.int32, (D, TW), 0))
                 + rgt) < WL
        cost = jnp.where(valid & (area > 0), cost, jnp.inf)

        # up-neighbor discount (reference sign quirk: compare -d)
        sign = -1.0 if smooth_mode == "reference" else 1.0
        if smooth_mode != "none":
            prev = prev_disp_ref[...]                              # (1, TW)
            up_hit = (dvals == sign * prev) & (y >= 1)
            cost_u = jnp.where(up_hit, cost * smooth_factor, cost)
        else:
            cost_u = cost

        sentinel = -xg.astype(f32)                                 # (1, TW)

        def resolve(left_disp):
            if smooth_mode != "none":
                hit = dvals == sign * left_disp
                c = jnp.where(hit, cost_u * smooth_factor, cost_u)
            else:
                c = cost_u
            best = jnp.min(c, axis=0, keepdims=True)               # (1, TW)
            idx = jnp.argmin(c, axis=0)[None, :].astype(f32) + float(min_d)
            return jnp.where(jnp.isfinite(best), idx, sentinel)

        nanv = jnp.float32(jnp.nan)
        # first column's left neighbor: previous tile's boundary (same row)
        first_left = jnp.where(wt > 0, boundary_ref[0, y], nanv)

        disp = resolve(jnp.full((1, TW), nanv))
        first_col = lax.broadcasted_iota(jnp.int32, (1, TW), 1) == 0
        for _ in range(max(0, jacobi_iters - 1)):
            left_disp = jnp.where(first_col, first_left, pltpu.roll(disp, 1, 1))
            disp = resolve(left_disp)

        # black right pixels stay 0 (reference skip); aligned load at x0
        # then static shift by the hbs front-pad
        rseg_a = right_y_ref[0, :, pl.ds(pl.multiple_of(x0, 128), TW + 128)]
        rseg = rseg_a[:, hbs : hbs + TW]                           # (3, TW)
        black = jnp.all(rseg == 0, axis=0, keepdims=True)          # (1, TW)
        disp = jnp.where(black, 0.0, disp)

        disp_ref[jnp.remainder(y, 8), :] = disp[0]
        prev_disp_ref[...] = disp
        boundary_ref[0, y] = disp[0, TW - 1]


@functools.partial(
    jax.jit, static_argnames=("config", "tile_width", "interpret", "smooth_mode")
)
def pallas_block_search_right(
    left: jnp.ndarray,        # (H, WL, 3)
    right: jnp.ndarray,       # (H, W, 3)
    config: MatcherConfig = MatcherConfig(),
    tile_width: int = 512,
    interpret: bool = False,
    smooth_mode: str = "reference",
) -> jnp.ndarray:
    """Right-image disparity, (H, W) f32, fully fused in one kernel."""
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    H, W = right.shape[:2]
    WL = left.shape[1]
    bs = config.block_size
    hbs = (bs - 1) // 2
    hw = 2 * hbs
    D = config.max_disparity - config.min_disparity

    TW = min(tile_width, _round_up(W, 128))
    n_wt = _cdiv(W, TW)
    Wp = n_wt * TW
    # padded widths covering every aligned kernel load:
    #   left chunks reach x0 + round_up(D,128) + TW + hw + 128
    #   right(+black) loads reach x0 + TW + 128
    WLtot = hbs + Wp + _round_up(D, 128) + hw + 128
    Wtot = hbs + Wp + 128

    # layout (H, 3, Wpad): per-row blocks (1, 3, Wpad) satisfy the TPU
    # tiling rule because the trailing two block dims equal the array dims.
    # Front-padded by hbs so every kernel slice start is non-negative; the
    # left image is additionally pre-shifted by min_disparity so kernel
    # chunk bases stay 128-aligned.
    left_s = left[:, config.min_disparity :, :] if config.min_disparity else left
    WLs = left_s.shape[1]
    left_t = jnp.transpose(
        jnp.pad(left_s, ((0, 0), (hbs, max(0, WLtot - hbs - WLs)), (0, 0))),
        (0, 2, 1),
    )[:, :, :WLtot]                                        # (H, 3, WLtot)
    right_t = jnp.transpose(
        jnp.pad(right, ((0, 0), (hbs, Wtot - hbs - W, ), (0, 0))), (0, 2, 1)
    )                                                      # (H, 3, Wtot)

    n_steps = H + hbs - 1
    Hpad = _round_up(H, 128)
    Hp8 = _round_up(H, 8)

    kernel = functools.partial(
        _kernel,
        TW=TW,
        D=D,
        hw=hw,
        hbs=hbs,
        min_d=config.min_disparity,
        smooth_factor=config.smooth_factor,
        smooth_mode=smooth_mode,
        jacobi_iters=config.row_smooth_iters,
        H=H,
        W=W,
        WL=WL,
        WLp=WLtot,
        Wp=Wtot,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_wt, n_steps),
        in_specs=[
            pl.BlockSpec(
                (1, 3, WLtot), lambda wt, s, dims: (jnp.minimum(s, H - 1), 0, 0)
            ),
            pl.BlockSpec(
                (1, 3, Wtot), lambda wt, s, dims: (jnp.minimum(s, H - 1), 0, 0)
            ),
            pl.BlockSpec(
                (1, 3, Wtot),
                lambda wt, s, dims: (
                    jnp.clip(s - (hbs - 1), 0, H - 1),
                    0,
                    0,
                ),
            ),
        ],
        # 8-row output blocks (TPU sublane tiling); rows accumulate in the
        # block buffer and flush when the mapped block index advances
        out_specs=pl.BlockSpec(
            (8, TW),
            lambda wt, s, dims: (jnp.clip(s - (hbs - 1), 0, H - 1) // 8, wt),
        ),
        scratch_shapes=[
            pltpu.VMEM((hw, D, TW), jnp.float32),
            pltpu.VMEM((1, TW), jnp.float32),
            pltpu.SMEM((1, Hpad), jnp.float32),
        ],
    )

    dims = jnp.array(
        [H, W, WL, D, config.min_disparity, hw, n_wt, -1], jnp.int32
    )

    disp = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp8, Wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dims, left_t, right_t, right_t)

    return disp[:H, :W]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
