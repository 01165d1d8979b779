"""Band-parallel Pallas TPU kernel for the Right-variant SSD cost volume.

The XLA path (ops/cost_volume.py) lowers each disparity plane's window
sums as width-16 ``reduce_window`` passes over full HBM-resident planes —
~64 unfused shifted-add sweeps per plane dominate its runtime. This
kernel instead keeps a 24-row band of both images resident in VMEM and
produces ALL disparity planes for 8 output rows per grid step, so HBM
traffic is images-once-in + volume-once-out:

  grid = (H/8, D/Dc)      # row band x disparity chunk (chunk innermost,
                          # so the band blocks are fetched once per band)

  Per step the kernel loops ``Dc`` disparities; for each it
    1. slices the left band at lane offset d (``pl.ds``) and forms the
       channel-summed squared difference against the right band,
    2. zeroes contributions outside the reference window support
       (rows/cols outside [0, H-1) x [0, W-1) — BlockSearch.cpp:116-123's
       clipped windows are exactly the fixed 16x16 window intersected
       with that region),
    3. window-sums vertically with an O(log hw) doubling tree of
       sublane-shift adds, and horizontally with either the same doubling
       tree over lanes (``HSUM_MODE="tree"``, the default — exact VPU
       adds) or ONE MXU banded matmul per group of 16 disparities at
       HIGHEST precision (``h[x] = sum_{m<hw} v[x+m]  ==  v @ M``,
       ``M[p,x] = [x <= p < x+hw]``) — both bit-exact for the
       integer-valued sums,
    4. applies the reference cost transform sqrt(SSD)/area
       (BlockSearch.cpp:156-158) and the candidate-validity /
       zero-area masks (+inf), and stores one (8, W) plane.

Output is the standard ``(D, H, W)`` cost volume consumed by
ops/smoothing.py — a drop-in replacement for
``cost_volume.cost_volume_right_ssd``; tests/test_pallas_cost_volume.py
checks interpret-mode agreement with it and with the reference-semantics
oracle, and bench.py's quality guard exercises the Mosaic-compiled kernel
on TPU against the oracle. This is the production Right-SSD path on TPU
(ops/block_search.py selects it via ``MatcherConfig.backend``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# horizontal window-sum implementation: "matmul" (banded MXU matmul at
# HIGHEST precision) or "tree" (VPU lane-shift doubling tree). Both are
# bit-exact for the integer-valued window sums and benched IDENTICAL
# throughput on v5e (500.6 vs 499.5 pairs/s) — the horizontal sum is not
# on the critical path — but "tree" costs 5.6x the Mosaic compile time
# (938s vs 168s), so "matmul" is the default.
HSUM_MODE = "matmul"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    geom_ref,    # (1, 2) int32 SMEM: [row0, H_total] — global id of local
                 # row 0 and the GLOBAL image height. For a halo-extended
                 # row tile of a larger image (parallel/sharded.py) these
                 # make window clipping/area use global coordinates, so
                 # every in-bounds row is bit-identical to the full-image
                 # kernel. Single-device: row0 = 0, H_total = H.
    lband_ref,   # (1, 3*24, WLt) left band, rows 8i-hbs .. 8i+8+hbs-1, ch-major
    rband_ref,   # (1, 3*24, Wt)  right band, same rows
    *out_refs,   # mode "volume": (cost_ref,) — (Dc, 8, Wtile) planes;
                 # mode "inputs": (m0, a0, czero, dup, dlf) — (8, Wtile)
                 # smoothing-scan inputs accumulated across dc chunks
    mode: str,
    Dc: int,
    D: int,
    hbs: int,
    min_d: int,
    W: int,
    WL: int,
    Wbw: int,    # band compute width for one W tile (Wtile + halo lanes)
    Wout: int,   # output lanes per W tile
    hsum: str,   # horizontal window sum: "tree" (VPU lane shifts, exact)
                 # or "matmul" (MXU banded matmul @ HIGHEST precision)
):
    i = pl.program_id(0)
    wt = pl.program_id(1)
    dc = pl.program_id(2)
    hw = 2 * hbs
    band_rows = 8 + hw
    f32 = jnp.float32
    w0 = wt * Wout                        # first global output col of tile
    row0 = geom_ref[0, 0]
    h_tot = geom_ref[0, 1]

    rb = rband_ref[0, :, pl.ds(pl.multiple_of(w0, 128), Wbw)]  # (3*br, Wbw)

    # validity of each band element: global row in [0, Htot-1), col in
    # [0, W-1) (the reference's clipped window support; lane p <-> global
    # col w0 + p - hbs)
    row_ids = (
        row0 + 8 * i - hbs
        + lax.broadcasted_iota(jnp.int32, (band_rows, 1), 0)
    )
    rows_ok = (row_ids >= 0) & (row_ids < h_tot - 1)         # (br, 1)
    col_ids = w0 + lax.broadcasted_iota(jnp.int32, (1, Wbw), 1) - hbs
    cols_ok = (col_ids >= 0) & (col_ids < W - 1)             # (1, Wbw)
    elem_ok = rows_ok & cols_ok                              # (br, Wbw)

    # per-output-pixel clipped geometry (global coords)
    xg = w0 + lax.broadcasted_iota(jnp.int32, (8, Wout), 1)  # global x
    yg = row0 + 8 * i + lax.broadcasted_iota(jnp.int32, (8, Wout), 0)
    lft = jnp.minimum(xg, hbs)
    rgt = jnp.minimum(W - 1 - xg, hbs)
    up = jnp.clip(jnp.minimum(yg, hbs), 0)
    down = jnp.clip(jnp.minimum(h_tot - 1 - yg, hbs), 0)
    area = ((lft + rgt) * (up + down)).astype(f32)
    area = jnp.where((yg >= 0) & (yg < h_tot), area, 0.0)
    pos_area = area > 0
    inv_area = jnp.where(pos_area, 1.0 / jnp.maximum(area, 1.0), 1.0)

    # dynamic lane starts must be 128-aligned on TPU: load one aligned
    # chunk covering Dc (a multiple of 128) consecutive shifts, then take
    # static in-register slices for each disparity (fully unrolled)
    base = pl.multiple_of(w0 + dc * Dc, 128)
    lc = lband_ref[0, :, pl.ds(base, Wbw + Dc)]              # (3*br, Wbw+Dc)

    if hsum != "tree":
        # banded 0/1 matrix for the matmul mode:
        # h[x] = sum_{m<hw} v[x+m]  ==  v @ M, M[p, x] = [x <= p < x+hw]
        p_ids = lax.broadcasted_iota(jnp.int32, (Wbw, Wout), 0)
        x_ids = lax.broadcasted_iota(jnp.int32, (Wbw, Wout), 1)
        band_mat = ((p_ids >= x_ids) & (p_ids < x_ids + hw)).astype(f32)

    # Precision note: all window sums are integer-valued < 2^24 (the
    # f32-exactness domain this kernel already relies on). A 0/1 selector
    # times the exact 3-way bf16 split of such an f32 value reconstructs
    # it exactly, so THREE bf16 passes are bit-exact here — HIGHEST's six
    # bought nothing but MXU time (the hsum matmul was the binding
    # resource of the roofline at 6 passes). Mosaic does not lower
    # Precision.HIGH, so the split is spelled out: three native bf16
    # matmuls over the exact hi/mid/lo decomposition.
    def dot3_exact(a, m01):
        """a @ m01 with f32-exact accumulation: a f32 with 24 significant
        bits, m01 a 0/1 matrix; 3 native bf16 passes."""
        m16 = m01.astype(jnp.bfloat16)
        hi16 = a.astype(jnp.bfloat16)
        r = a - hi16.astype(f32)
        mid16 = r.astype(jnp.bfloat16)
        lo16 = (r - mid16.astype(f32)).astype(jnp.bfloat16)

        def d(x16):
            # explicit DEFAULT precision: the package pins the global
            # default to HIGHEST, which would tag this bf16 matmul with
            # an fp32 contract precision Mosaic rejects ("Bad lhs type")
            return jax.lax.dot_general(
                x16, m16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(hi16) + d(mid16) + d(lo16)

    GD = 128 // 8                                            # disparities per matmul
    inv_area_g = jnp.concatenate([inv_area] * GD, axis=0)    # (128, Wout)
    pos_area_g = jnp.concatenate([pos_area] * GD, axis=0)
    xg_g = jnp.concatenate([xg] * GD, axis=0)
    rgt_g = jnp.concatenate([rgt] * GD, axis=0)
    sub_d = lax.broadcasted_iota(jnp.int32, (8 * GD, Wout), 0) // 8

    if mode == "inputs":
        m0_ref, a0_ref, cz_ref, du_ref, dl_ref = out_refs

        @pl.when(dc == 0)
        def _init():
            m0_ref[...] = jnp.full((8, Wout), jnp.inf, f32)
            a0_ref[...] = jnp.zeros((8, Wout), jnp.int32)
            cz_ref[...] = jnp.full((8, Wout), jnp.inf, f32)
            du_ref[...] = jnp.full((8, Wout), jnp.inf, f32)
            dl_ref[...] = jnp.full((8, Wout), jnp.inf, f32)
    else:
        (cost_ref,) = out_refs

    def group_body(g, d0):
        vs = []
        for t in range(GD):
            j = g * GD + t
            ls = lc[:, j : j + Wbw]                          # (3*br, Wbw)
            diff = ls - rb
            sq = diff * diff
            dsq = (
                sq[0 * band_rows : 1 * band_rows]
                + sq[1 * band_rows : 2 * band_rows]
                + sq[2 * band_rows : 3 * band_rows]
            )                                                # (br, Wbw)
            dsq = jnp.where(elem_ok, dsq, 0.0)
            # vertical window sum (out row k needs band rows k..k+hw-1)
            # as a doubling tree: O(log hw) shifted adds; sums[n][i] =
            # sum of n consecutive band rows starting at i. (An MXU
            # (8, br) @ (br, Wbw) formulation crashes the Mosaic
            # compile-helper — sub-tile bf16/f32 operand shapes — so the
            # VPU tree stays.)
            sums = {1: dsq}
            p = 1
            while p * 2 <= hw:
                s = sums[p]
                sums[p * 2] = s[: s.shape[0] - p] + s[p:]
                p *= 2
            acc, off, bit = None, 0, p
            while bit >= 1:
                if hw & bit:
                    term = sums[bit][off : off + 8]
                    acc = term if acc is None else acc + term
                    off += bit
                bit //= 2
            vs.append(acc)                                   # (8, Wbw)
        v = jnp.concatenate(vs, axis=0)                      # (128, Wbw)
        # horizontal window sum. Exactness matters: the sums are
        # integer-valued (< 2^24, exact in f32 under ANY summation
        # order), but default-precision MXU matmuls run bf16 passes that
        # perturb costs by ~0.1 and flip ~0.5% of argmin decisions.
        if hsum == "tree":
            # lane-axis doubling tree: O(log hw) shifted VPU adds —
            # exact, and cheaper than a 6-pass f32 matmul
            hs = {1: v}
            q = 1
            while q * 2 <= hw:
                s = hs[q]
                hs[q * 2] = s[:, : s.shape[1] - q] + s[:, q:]
                q *= 2
            h, off, bit = None, 0, q
            while bit >= 1:
                if hw & bit:
                    term = hs[bit][:, off : off + Wout]
                    h = term if h is None else h + term
                    off += bit
                bit //= 2
        else:
            # MXU banded matmul; 3 bf16 passes reconstruct f32 exactly
            # for these integer-valued sums (see dot3_exact note)
            h = dot3_exact(v, band_mat)                      # (128, Wout)

        cost = jnp.sqrt(jnp.maximum(h, 0.0)) * inv_area_g
        valid = (
            pos_area_g
            & ((xg_g + (min_d + d0) + sub_d + rgt_g) < WL)
            & (d0 + sub_d < D)
        )
        cost = jnp.where(valid, cost, jnp.inf)
        if mode == "volume":
            cost_ref[g * GD : (g + 1) * GD, :, :] = cost.reshape(GD, 8, Wout)
            return

        # mode "inputs": fold this group's GD planes into the running
        # smoothing-scan inputs (ops/smoothing.py smoothed_argmin_reference):
        # the volume itself never leaves VMEM.
        m0_acc = m0_ref[...]
        a0_acc = a0_ref[...]
        cz_acc = cz_ref[...]
        du_acc = du_ref[...]
        dl_acc = dl_ref[...]
        for t in range(GD):
            plane = cost[t * 8 : (t + 1) * 8]                # (8, Wout)
            j = d0 + t                                        # traced scalar
            # running (min, first-argmin): strict < keeps the smallest d
            better = plane < m0_acc
            m0_acc = jnp.where(better, plane, m0_acc)
            a0_acc = jnp.where(better, j, a0_acc)
            # plane of candidate d == 0 (global plane index -min_d)
            cz_acc = jnp.where(j == -min_d, plane, cz_acc)
            # diagonals: cost[x - min_d] (up-sentinel) / cost[x-1-min_d]
            du_acc = jnp.where(xg == j + min_d, plane, du_acc)
            dl_acc = jnp.where(xg - 1 == j + min_d, plane, dl_acc)
        m0_ref[...] = m0_acc
        a0_ref[...] = a0_acc
        cz_ref[...] = cz_acc
        du_ref[...] = du_acc
        dl_ref[...] = dl_acc

    # skip whole groups past the last real plane: D need not divide Dc, so
    # the final chunk's tail groups would otherwise burn VPU/MXU cycles
    # computing all-inf planes (22% of the kernel at D=200 -> Dp=256)
    for g in range(Dc // GD):
        d0 = dc * Dc + g * GD

        if mode == "volume":
            @pl.when(d0 >= D)
            def _pad(g=g):
                cost_ref[g * GD : (g + 1) * GD, :, :] = jnp.full(
                    (GD, 8, Wout), jnp.inf, f32
                )

        @pl.when(d0 < D)
        def _do(g=g, d0=d0):
            group_body(g, d0)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "min_disparity", "max_disparity",
                     "d_chunk", "interpret"),
)
def pallas_cost_volume_right_ssd(
    left: jnp.ndarray,    # (H, W_l, 3)
    right: jnp.ndarray,   # (H, W, 3)
    block_size: int = 17,
    min_disparity: int = 0,
    max_disparity: int = 200,
    d_chunk: int = 128,
    interpret: bool = False,
    row_offset=0,         # global index of local row 0 (may be traced)
    total_height=None,    # global image height (None -> H)
) -> jnp.ndarray:
    """Right-variant SSD cost volume, (D, H, W) f32, +inf = invalid.

    Numerically matches ``cost_volume.cost_volume_right_ssd`` (same
    integer-valued window sums; summation order differs only in f32
    rounding beyond ~2^24). ``row_offset``/``total_height`` switch the
    window geometry to GLOBAL row coordinates for halo-extended row tiles
    of a larger image (the sharded matcher, parallel/sharded.py).

    Global-mode contract: when ``0 < row_offset`` (resp. the tile does not
    reach the image bottom), the FIRST (resp. LAST) ``2*hbs`` output rows
    read local zero-padding as if it were image content and must be
    discarded by the caller — exactly the window-support halo rows the
    sharded matcher strips anyway.
    """
    out = _run(left, right, block_size, min_disparity, max_disparity,
               d_chunk, interpret, mode="volume",
               row_offset=row_offset, total_height=total_height)
    H, W = right.shape[:2]
    return out[: max_disparity - min_disparity, :H, :W]


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "min_disparity", "max_disparity",
                     "d_chunk", "interpret"),
)
def pallas_matcher_inputs(
    left: jnp.ndarray,    # (H, W_l, 3)
    right: jnp.ndarray,   # (H, W, 3)
    block_size: int = 17,
    min_disparity: int = 0,
    max_disparity: int = 200,
    d_chunk: int = 128,
    interpret: bool = False,
    row_offset=0,         # global index of local row 0 (may be traced)
    total_height=None,    # global image height (None -> H)
):
    """Fused cost-volume + smoothing-input reduction: the (D, H, W)
    volume never leaves VMEM.

    Returns the five (H, W) inputs of the exact smoothing row scan
    (ops/smoothing.py ``smoothed_argmin_reference``):
      m0       min over D of the cost volume
      a0       first-argmin plane index (int32)
      c_zero   the d == 0 plane (+inf everywhere if 0 not in range)
      diag_up  cost[x - min_disparity, y, x]   (+inf out of range)
      diag_lf  cost[x-1-min_disparity, y, x]   (+inf out of range)

    vs the unfused path this removes the volume's HBM round trip
    (write D*H*W + ~6 reduction read passes -> 5 H*W planes out).
    """
    m0, a0, cz, du, dl = _run(
        left, right, block_size, min_disparity, max_disparity,
        d_chunk, interpret, mode="inputs",
        row_offset=row_offset, total_height=total_height,
    )
    H, W = right.shape[:2]
    return (m0[:H, :W], a0[:H, :W], cz[:H, :W], du[:H, :W], dl[:H, :W])


def _run(left, right, block_size, min_disparity, max_disparity,
         d_chunk, interpret, mode, row_offset=0, total_height=None):
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    H, W = right.shape[:2]
    h_tot = H if total_height is None else total_height
    geom = jnp.asarray([[row_offset, h_tot]], jnp.int32)
    WL = left.shape[1]
    hbs = (block_size - 1) // 2
    hw = 2 * hbs
    D = max_disparity - min_disparity

    H8 = _cdiv(H, 8)
    Dc = _round_up(max(1, min(d_chunk, D)), 128)  # aligned chunk loads
    Dp = _round_up(D, Dc)
    # width tiling: wide images would otherwise blow the ~16 MB VMEM
    # scoped budget (the (Dc, 8, W) output block and the (W+halo, W)
    # banded matmul matrix both scale with W)
    Wout = min(_round_up(W, 128), 512)            # output lanes per W tile
    Wn = _cdiv(_round_up(W, 128), Wout)
    Wpad = Wn * Wout
    Wbw = Wout + _round_up(hw, 128)
    Wt = Wpad + _round_up(hw, 128)
    WLt = Wt + _round_up(Dp, 128)

    # channel-major 24-row bands, front-padded by hbs lanes (lane p <->
    # global col p - hbs); the left image pre-shifted by min_disparity so
    # the kernel's lane offset is the plane index d
    def bands(img, w_img, shift, total_w):
        img = img[:, shift:, :] if shift else img
        w_eff = img.shape[1]
        pad_bottom = 8 * H8 + hbs + hw - (H + hbs)
        p = jnp.pad(
            img,
            ((hbs, pad_bottom), (hbs, max(0, total_w - hbs - w_eff)), (0, 0)),
        )[:, :total_w, :]
        idx = 8 * jnp.arange(H8)[:, None] + jnp.arange(8 + hw)[None, :]
        b = p[idx]                                   # (H8, br, total_w, 3)
        return jnp.transpose(b, (0, 3, 1, 2)).reshape(H8, 3 * (8 + hw), total_w)

    lband = bands(left, WL, min_disparity, WLt)
    rband = bands(right, W, 0, Wt)

    kernel = functools.partial(
        _kernel, mode=mode, Dc=Dc, D=D, hbs=hbs, min_d=min_disparity,
        W=W, WL=WL, Wbw=Wbw, Wout=Wout, hsum=HSUM_MODE,
    )

    if mode == "volume":
        out_specs = pl.BlockSpec((Dc, 8, Wout), lambda i, wt, dc: (dc, i, wt))
        out_shape = jax.ShapeDtypeStruct((Dp, 8 * H8, Wpad), jnp.float32)
    else:
        plane = pl.BlockSpec((8, Wout), lambda i, wt, dc: (i, wt))
        out_specs = [plane] * 5
        f32p = jax.ShapeDtypeStruct((8 * H8, Wpad), jnp.float32)
        out_shape = [f32p, jax.ShapeDtypeStruct((8 * H8, Wpad), jnp.int32),
                     f32p, f32p, f32p]

    return pl.pallas_call(
        kernel,
        grid=(H8, Wn, Dp // Dc),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, wt, dc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * (8 + hw), WLt), lambda i, wt, dc: (i, 0, 0)),
            pl.BlockSpec((1, 3 * (8 + hw), Wt), lambda i, wt, dc: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(geom, lband, rband)
