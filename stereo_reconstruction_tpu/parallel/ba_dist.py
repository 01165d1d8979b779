"""Distributed Schur-complement bundle adjustment.

Multi-host/multi-chip version of pose/ba.py: the 3D points are sharded
over the ``data`` mesh axis; each device eliminates its local point blocks
and the reduced 6x6 camera system (S, rhs) — 42 floats — is ``psum``-ed
across the mesh (SURVEY.md §2: "Distributed Schur-complement BA"; the
tiny all-reduce rides ICI). The pose update is computed redundantly on
every device; point back-substitution stays local. This scales to any
number of points with O(1) communication per LM iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereo_reconstruction_tpu.config import BundleAdjustmentConfig
from stereo_reconstruction_tpu.ops import geometry as geo
from stereo_reconstruction_tpu.pose.ba import BAResult, _residuals_one


@functools.lru_cache(maxsize=16)
def _build_dist_ba(mesh: Mesh, config: BundleAdjustmentConfig,
                   shard_axes: tuple, batched: bool = False):
    """Cached jitted shard_map BA — one compile per (mesh, config, axes).

    ``batched=True`` vmaps the per-device LM over a leading PAIR axis:
    B independent two-view problems advance in lockstep and their Schur
    systems ride ONE fused psum of (B, 42) floats per LM iteration (plus
    one (B,) cost psum for the accept test) instead of B separate
    collective chains — on a latency-bound fabric the per-pair collective
    cost is divided by B (VERDICT r3 item 7). This is the production
    multi-pair pattern (pipeline_batch processes B pairs at a time)."""

    def local(kp_l_blk, kp_r_blk, w_blk, X0_blk, pose0, K_left, K_right):
        """Runs on each device with a shard of the points."""
        res_fn = functools.partial(_residuals_one, K_left=K_left, K_right=K_right)

        def residuals_all(pose6, X):
            return jax.vmap(lambda x, kl, kr: res_fn(pose6, x, kl, kr))(
                X, kp_l_blk, kp_r_blk
            )

        def psum_all(x):
            for ax in shard_axes:
                x = lax.psum(x, ax)
            return x

        def cost(pose6, X):
            r = residuals_all(pose6, X)
            return psum_all(jnp.sum((r * r) * w_blk[:, None]))

        jac_pose = jax.vmap(
            lambda x, kl, kr, p: jax.jacfwd(lambda q: res_fn(q, x, kl, kr))(p),
            in_axes=(0, 0, 0, None),
        )
        jac_point = jax.vmap(
            lambda x, kl, kr, p: jax.jacfwd(lambda xx: res_fn(p, xx, kl, kr))(x),
            in_axes=(0, 0, 0, None),
        )

        def robust_weights(pose6, X):
            if config.loss != "huber":
                return w_blk
            r = residuals_all(pose6, X)
            err = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
            return w_blk * jnp.sqrt(jnp.minimum(1.0, config.huber_delta / err))

        def lm_step(state, _):
            pose6, X, lam, current_cost = state
            rw = robust_weights(pose6, X)
            r = residuals_all(pose6, X) * rw[:, None]
            Jp = jac_pose(X, kp_l_blk, kp_r_blk, pose6) * rw[:, None, None]
            Jx = jac_point(X, kp_l_blk, kp_r_blk, pose6) * rw[:, None, None]

            B = jnp.einsum("nri,nrj->ij", Jp, Jp)
            E = jnp.einsum("nri,nrj->nij", Jp, Jx)
            C = jnp.einsum("nri,nrj->nij", Jx, Jx)
            v = -jnp.einsum("nri,nr->i", Jp, r)
            g = -jnp.einsum("nri,nr->ni", Jx, r)

            C_inv = jnp.linalg.inv(C + lam * jnp.eye(3)[None])
            EC = E @ C_inv
            S_local = B - jnp.einsum("nij,nkj->ik", EC, E)
            rhs_local = v - jnp.einsum("nij,nj->i", EC, g)

            # THE collective: reduce the 6x6 camera system across shards.
            # S and rhs ride ONE packed psum (42 floats) — on a latency-
            # bound fabric (DCN / Gloo) one collective phase per LM step
            # beats two.
            packed = psum_all(jnp.concatenate([S_local.reshape(-1), rhs_local]))
            S = packed[:36].reshape(6, 6) + lam * jnp.eye(6)
            rhs = packed[36:]
            d_pose = jnp.linalg.solve(S, rhs)

            d_X = jnp.einsum(
                "nij,nj->ni", C_inv, g - jnp.einsum("nji,j->ni", E, d_pose)
            )

            new_pose = pose6 + d_pose
            new_X = X + d_X
            new_cost = cost(new_pose, new_X)
            accept = new_cost < current_cost
            pose6 = jnp.where(accept, new_pose, pose6)
            X = jnp.where(accept, new_X, X)
            lam = jnp.where(
                accept,
                jnp.maximum(lam * config.lambda_down, config.min_lambda),
                jnp.minimum(lam * config.lambda_up, config.max_lambda),
            )
            current_cost = jnp.where(accept, new_cost, current_cost)
            return (pose6, X, lam, current_cost), None

        c0 = cost(pose0, X0_blk)
        init = (pose0, X0_blk, jnp.asarray(config.init_lambda, jnp.float32), c0)
        (pose_f, X_f, _, cost_f), _ = lax.scan(
            lm_step, init, None, length=config.max_iterations
        )
        return pose_f, X_f, c0, cost_f

    if batched:
        # vmap over the leading pair axis; the psums inside lm_step batch
        # into single collectives over (B, ...) payloads
        body = jax.vmap(local, in_axes=(0, 0, 0, 0, 0, None, None))
        in_specs = (
            P(None, shard_axes, None),  # kp_l (B, N, 3) point-sharded
            P(None, shard_axes, None),
            P(None, shard_axes),
            P(None, shard_axes, None),  # X0 (B, N, 3)
            P(None, None),              # pose0 (B, 6) replicated
            P(), P(),
        )
        out_specs = (P(None, None), P(None, shard_axes, None), P(None),
                     P(None))
    else:
        body = local
        in_specs = (
            P(shard_axes, None),  # kp_l (N, 3) row-sharded
            P(shard_axes, None),
            P(shard_axes),
            P(shard_axes, None),  # X0 (N, 3)
            P(), P(), P(),
        )
        out_specs = (P(), P(shard_axes, None), P(), P())

    # points ride the flattened mesh; kp/weights shard with them
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def distributed_bundle_adjust(
    matches_left: jnp.ndarray,    # (3, N) — N sharded over the mesh
    matches_right: jnp.ndarray,
    K_left: jnp.ndarray,
    K_right: jnp.ndarray,
    init_rotation: jnp.ndarray,
    init_translation: jnp.ndarray,
    init_points: jnp.ndarray,     # (3, N)
    mesh: Mesh,
    weights: jnp.ndarray | None = None,
    config: BundleAdjustmentConfig = BundleAdjustmentConfig(),
    shard_axes: tuple = ("data", "tile"),
) -> BAResult:
    n = matches_left.shape[-1]
    w = jnp.ones((n,)) if weights is None else weights.astype(jnp.float32)
    pose0 = jnp.concatenate(
        [geo.rotation_to_angle_axis(init_rotation), init_translation]
    )

    fn = _build_dist_ba(mesh, config, tuple(shard_axes))
    pose_f, X_f, c0, cost_f = fn(
        matches_left.T, matches_right.T, w, init_points.T, pose0,
        K_left, K_right,
    )

    R = geo.angle_axis_to_rotation(pose_f[:3])
    T = pose_f[3:]
    pose_mat = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(T)
    E_mat = geo.essential_from_pose(R, T)
    F = geo.fundamental_from_essential(E_mat, K_left, K_right)
    return BAResult(
        rotation=R, translation=T, pose=pose_mat, points=X_f.T,
        initial_cost=c0, final_cost=cost_f, fundamental=F,
    )


def distributed_bundle_adjust_batch(
    matches_left: jnp.ndarray,    # (B, 3, N) — N sharded over the mesh
    matches_right: jnp.ndarray,
    K_left: jnp.ndarray,
    K_right: jnp.ndarray,
    init_rotations: jnp.ndarray,  # (B, 3, 3)
    init_translations: jnp.ndarray,  # (B, 3)
    init_points: jnp.ndarray,     # (B, 3, N)
    mesh: Mesh,
    weights: jnp.ndarray | None = None,   # (B, N)
    config: BundleAdjustmentConfig = BundleAdjustmentConfig(),
    shard_axes: tuple = ("data", "tile"),
):
    """B independent two-view BAs as ONE vmapped distributed LM.

    Per LM iteration all B Schur systems ride a single fused psum
    ((B, 42) floats) plus one fused (B,) cost psum — B times fewer
    collective phases than B sequential ``distributed_bundle_adjust``
    calls; the amortization is what restores weak-scaling efficiency on
    latency-bound fabrics (MULTIHOST.json ba_batch rows). Semantics per
    pair are identical to ``distributed_bundle_adjust`` (same LM, same
    Schur elimination; reference anchor bundle_adjustment.h:205-230).

    Returns (poses (B, 4, 4), fundamentals (B, 3, 3), initial_costs (B,),
    final_costs (B,), points (B, 3, N)).
    """
    b, _, n = matches_left.shape
    w = (jnp.ones((b, n)) if weights is None
         else weights.astype(jnp.float32))
    pose0 = jnp.concatenate([
        jax.vmap(geo.rotation_to_angle_axis)(init_rotations),
        init_translations,
    ], axis=-1)

    fn = _build_dist_ba(mesh, config, tuple(shard_axes), batched=True)
    pose_f, X_f, c0, cost_f = fn(
        jnp.swapaxes(matches_left, 1, 2),
        jnp.swapaxes(matches_right, 1, 2),
        w, jnp.swapaxes(init_points, 1, 2), pose0,
        K_left, K_right,
    )

    R = jax.vmap(geo.angle_axis_to_rotation)(pose_f[:, :3])
    T = pose_f[:, 3:]
    poses = (jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
             .at[:, :3, :3].set(R).at[:, :3, 3].set(T))
    E = jax.vmap(geo.essential_from_pose)(R, T)
    F = jax.vmap(
        lambda e: geo.fundamental_from_essential(e, K_left, K_right))(E)
    return poses, F, c0, cost_f, jnp.swapaxes(X_f, 1, 2)
