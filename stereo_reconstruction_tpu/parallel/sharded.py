"""Sharded dense matching: cost-volume row tiles across chips.

The BlockSearch hot loop's H dimension is sharded over the ``tile`` mesh
axis; window costs need ``halo = block_size//2`` rows from the row-wise
neighbors, exchanged with ``jax.lax.ppermute`` over ICI (SURVEY.md §2
"Parallelism" table). Image-pair batches ride the ``data`` axis. Metric
reductions are ``psum``s (sharded_evaldisp).

Smoothing across tile boundaries: the reference's up-neighbor recurrence
is sequential over all rows; a sharded scan would serialize the tiles. We
run the recurrence tile-locally (each tile's first row sees no up-neighbor
discount) — the boundary effect is one row per tile and is validated in
tests to stay inside the quality budget. (The in-row term is unaffected.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from stereo_reconstruction_tpu.config import MatcherConfig
from stereo_reconstruction_tpu.ops import cost_volume as cv
from stereo_reconstruction_tpu.ops import smoothing


def _halo_exchange(block: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a (Hloc, W, ...) row block with `halo` rows from the previous /
    next device along `axis_name` (zeros at the ends)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # send my top rows to the previous device (they become its bottom halo)
    top = block[:halo]
    bottom = block[-halo:]
    from_next = lax.ppermute(top, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_prev = lax.ppermute(bottom, axis_name, [(i, (i + 1) % n) for i in range(n)])

    # zero the wrapped ends (first tile has no rows above, last none below)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, block, from_next], axis=0)


def sharded_block_search_right(
    left: jnp.ndarray,      # (B, H, W, 3) batch of rectified pairs
    right: jnp.ndarray,     # (B, H, W, 3)
    mesh: Mesh,
    config: MatcherConfig = MatcherConfig(),
) -> jnp.ndarray:
    """(B, H, W) disparity; B sharded on `data`, H sharded on `tile`."""
    hbs = (config.block_size - 1) // 2
    halo = 2 * hbs
    h = right.shape[1]

    def local(left_blk, right_blk):
        # left_blk/right_blk: (Bloc, Hloc, W, 3)
        def per_pair(lb, rb):
            lb_h = _halo_exchange(lb, halo, "tile")
            rb_h = _halo_exchange(rb, halo, "tile")
            n = lax.axis_size("tile")
            idx = lax.axis_index("tile")

            cost = cv.cost_volume_right_ssd(
                lb_h.astype(jnp.float32),
                rb_h.astype(jnp.float32),
                config.block_size,
                config.min_disparity,
                config.max_disparity,
            )                                    # (D, Hloc+2*halo, W)
            # interior window-geometry fixup: the clipped-window/area logic
            # inside cost_volume assumes image borders at the block edges;
            # rows in the halo-extended interior use full windows, which is
            # correct everywhere except the true image top/bottom (first/
            # last tile), where the zero halo reproduces the border clip
            # only approximately. Validated against the quality budget.
            cost = cost[:, halo:-halo, :]

            dvals = jnp.arange(config.min_disparity, config.max_disparity)
            black = cv.black_pixel_mask(rb)
            disp = smoothing.smoothed_argmin(
                cost, dvals, black,
                smooth_factor=config.smooth_factor,
                mode="reference",
                iters=config.row_smooth_iters,
                variant="right",
            )
            return disp

        return jax.vmap(per_pair)(left_blk, right_blk)

    spec_in = P("data", "tile", None, None)
    spec_out = P("data", "tile", None)
    fn = shard_map(
        local, mesh=mesh, in_specs=(spec_in, spec_in), out_specs=spec_out,
        check_rep=False,
    )
    return jax.jit(fn)(left, right)


def sharded_evaldisp(
    disp: jnp.ndarray,      # (B, H, W) sharded like the matcher output
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    mesh: Mesh,
    bad_thresh: float = 2.0,
    max_disp: float = 1e9,
):
    """Global Middlebury metrics over a sharded batch via psum."""

    def local(d, g, m):
        d = d.astype(jnp.float32)
        g = g.astype(jnp.float32)
        known = jnp.isfinite(g)
        evaluated = known & (m == 255)
        valid = d != 0
        dd = jnp.where(valid, jnp.clip(d, 0.0, max_disp), d)
        err = jnp.abs(dd - g)

        n = jnp.sum(evaluated)
        n_valid = jnp.sum(evaluated & valid)
        bad = jnp.sum(evaluated & valid & (err > bad_thresh))
        serr = jnp.sum(jnp.where(evaluated & valid, err, 0.0))

        stats = jnp.stack([n, n_valid, bad, serr.astype(jnp.float32)])
        total = lax.psum(lax.psum(stats, "tile"), "data")
        n, n_valid, bad, serr = total[0], total[1], total[2], total[3]
        invalid = n - n_valid
        out = jnp.stack(
            [
                100.0 * bad / jnp.maximum(n, 1),
                100.0 * invalid / jnp.maximum(n, 1),
                100.0 * (bad + invalid) / jnp.maximum(n, 1),
                serr / jnp.maximum(n_valid, 1),
            ]
        )
        return out

    spec = P("data", "tile", None)
    fn = shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=P(), check_rep=False,
    )
    vals = jax.jit(fn)(disp, gt, mask)
    return {
        "bad_percent": vals[0],
        "invalid_percent": vals[1],
        "total_bad_percent": vals[2],
        "avg_err": vals[3],
    }
