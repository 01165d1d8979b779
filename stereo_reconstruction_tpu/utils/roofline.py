"""Analytic roofline model of the fused Pallas matcher (VERDICT r4 #4).

The r2-r4 benches reported "%-of-MXU-bf16-peak" for the dense matcher —
honest but meaningless: the SSD window search is VPU/HBM work by design,
so percent-of-matmul-peak reads ~0 no matter how good the kernel is.
This module instead derives the three *hardware* lower bounds the fused
kernel (ops/pallas_cost_volume.py, mode="inputs") actually faces on one
v5e core and names the binding one:

  * HBM bytes: images in, band tensors written+read once per (W-tile,
    D-chunk) visit, five scan-input planes out, plus the smoothing scan's
    plane traffic (the kernel is explicitly designed so the (D, H, W)
    volume itself NEVER touches HBM);
  * VPU ops: the per-(band-row-block, disparity) elementwise pipeline —
    lane-shift slice, diff, square, channel fold, support mask, vertical
    doubling-tree window sum — plus the running smoothing-input folds;
  * MXU flops: the horizontal window sum as a banded matmul at HIGHEST
    precision (6 bf16 passes reconstruct the exact f32 integer sums,
    pallas_cost_volume.py HSUM_MODE="matmul").

Peaks (v5e, one TensorCore):
  HBM   819 GB/s   (public v5e spec)
  MXU   197 TFLOP/s bf16 (BASELINE.json / bench.py V5E_PEAK_BF16)
  VPU   3.85 TFLOP/s f32 — 8x128 lanes x 4 ALUs x 0.94 GHz; an estimate
        (the VPU issue model is not public), stated so the derived bound
        is auditable.

All counts re-derive the kernel's tiling EXACTLY as _run does (same
rounding to 128-lane tiles, same group skipping past the last real
plane), so the model tracks the code it bounds; test_roofline.py pins
the derivation against hand-computed values and the kernel's tile math.
"""

from __future__ import annotations

from typing import Dict

HBM_BYTES_PER_S = 819e9
MXU_FLOPS = 197e12
VPU_FLOPS = 3.85e12


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def matcher_roofline(
    H: int,
    W: int,
    D: int,
    block_size: int = 17,
    WL: int | None = None,
    input_bytes_per_px: int = 4,
) -> Dict:
    """Lower bounds for one pair through the fused matcher path
    (pallas_matcher_inputs + smoothed_argmin_from_inputs).

    ``input_bytes_per_px``: bytes per scalar of the image tensors as the
    band builder reads them (4 after the f32 cast; the uint8->f32 cast
    itself is counted separately as a read of 1-byte pixels + f32 write).
    """
    WL = W if WL is None else WL
    hbs = (block_size - 1) // 2
    hw = 2 * hbs
    br = 8 + hw                       # band rows per row block
    GD = 128 // 8                     # disparities per matmul group

    # --- tiling, exactly as pallas_cost_volume._run computes it
    H8 = _cdiv(H, 8)
    Dc = _round_up(max(1, min(128, D)), 128)
    Dp = _round_up(D, Dc)
    Wout = min(_round_up(W, 128), 512)
    Wn = _cdiv(_round_up(W, 128), Wout)
    Wpad = Wn * Wout
    Wbw = Wout + _round_up(hw, 128)
    Wt = Wpad + _round_up(hw, 128)
    WLt = Wt + _round_up(Dp, 128)
    n_chunks = Dp // Dc
    # groups that actually run (pl.when skips whole groups past D)
    groups_per_chunk = [
        sum(1 for g in range(Dc // GD) if c * Dc + g * GD < D)
        for c in range(n_chunks)
    ]
    n_groups = sum(groups_per_chunk)            # per (band, W-tile)
    # disparity slots actually computed (masked tails still burn ops)
    n_dslots = n_groups * GD

    f32 = 4

    # --- HBM bytes ------------------------------------------------------
    img_in = H * W * 3 * input_bytes_per_px * 2           # both images read
    band_write = H8 * 3 * br * (WLt + Wt) * f32
    band_read = H8 * Wn * n_chunks * 3 * br * (WLt + Wt) * f32
    planes_out = (8 * H8) * Wpad * 5 * f32                # m0,a0,cz,du,dl
    scan_read = planes_out                                 # scan reads them
    scan_misc = H * W * 3 * input_bytes_per_px            # black-pixel mask
    disp_out = H * W * f32
    actual_bytes = (img_in + band_write + band_read + planes_out
                    + scan_read + scan_misc + disp_out)
    compulsory_bytes = H * W * 3 * input_bytes_per_px * 2 + disp_out

    # --- VPU ops (per band-row-block x computed disparity slot) ---------
    elem = 3 * br * Wbw
    slice_ops = elem                       # lane-shift copy of the l band
    diff_sq = 2 * elem                     # sub + mul
    ch_fold = 2 * br * Wbw                 # 3 channels -> 1: two adds
    mask = br * Wbw                        # select
    # vertical doubling tree for hw = 16: shifted adds at sizes
    # (br-1) + (br-3) + (br-7) + (br-15) rows
    vtree = 0
    p = 1
    while p * 2 <= hw:
        vtree += (br - p) * Wbw
        p *= 2
    per_slot = slice_ops + diff_sq + ch_fold + mask + vtree
    # smoothing-input fold: ~6 selects/compares over the (8, Wout) plane
    fold = 6 * 8 * Wout
    # cost transform: sqrt + mul + 3 compares over (128, Wout) per group
    transform = 5 * 128 * Wout / GD
    vpu_ops = H8 * Wn * n_dslots * (per_slot + fold + transform)
    # smoothing scan: ~40 VPU ops per output pixel over row_smooth sweeps
    vpu_ops += 40 * H * W

    # --- MXU flops: the horizontal banded window sum, (128, Wbw) @
    # (Wbw, Wout) per 16-disparity group, as an exact manual bf16x3
    # split (3 native bf16 passes; see pallas_cost_volume.dot3_exact)
    PASSES = 3
    mxu_flops = H8 * Wn * n_groups * PASSES * 2 * 128 * Wbw * Wout

    t_hbm = actual_bytes / HBM_BYTES_PER_S
    t_vpu = vpu_ops / VPU_FLOPS
    t_mxu = mxu_flops / MXU_FLOPS
    bounds = {"hbm": t_hbm, "vpu": t_vpu, "mxu": t_mxu}
    binding = max(bounds, key=bounds.get)

    return {
        "H": H, "W": W, "D": D, "block_size": block_size,
        "tiling": {"H8": H8, "Wn": Wn, "Wout": Wout, "Wbw": Wbw,
                   "Dc": Dc, "Dp": Dp, "n_groups": n_groups,
                   "n_dslots": n_dslots},
        "hbm_bytes_actual": int(actual_bytes),
        "hbm_bytes_compulsory": int(compulsory_bytes),
        "vpu_ops": int(vpu_ops),
        "mxu_flops": int(mxu_flops),
        "floor_ms": {k: round(v * 1e3, 4) for k, v in bounds.items()},
        "binding_resource": binding,
        "floor_ms_binding": round(bounds[binding] * 1e3, 4),
        "peaks": {"hbm_bytes_per_s": HBM_BYTES_PER_S,
                  "mxu_flops": MXU_FLOPS, "vpu_flops": VPU_FLOPS},
    }


def report(measured_ms_per_pair: float, H: int, W: int, D: int,
           block_size: int = 17) -> Dict:
    """Roofline record for the bench: measured time vs each bound."""
    r = matcher_roofline(H, W, D, block_size)
    r["measured_ms_per_pair"] = round(measured_ms_per_pair, 4)
    r["gap_to_binding_bound"] = round(
        measured_ms_per_pair / max(r["floor_ms_binding"], 1e-9), 2)
    for k, v in r["floor_ms"].items():
        r.setdefault("pct_of_peak", {})[k] = round(
            100.0 * v / max(measured_ms_per_pair, 1e-9), 2)
    return r
