#!/usr/bin/env python3
"""True multi-process scaling bench (the "2+ hosts" north-star check).

SCALING.json measures sharding efficiency inside ONE process on a virtual
device mesh; this tool runs the same sharded entry points across REAL
separate processes joined with ``jax.distributed`` — each pinned to its
own CPU core, 1 XLA CPU device per process, all cross-process traffic
through XLA collectives on the Gloo backend (the CPU stand-in for
ICI/DCN; the program is identical on a TPU pod, SURVEY.md §5
"Distributed communication backend").

Workloads (all through ``parallel.multihost`` + the production sharded
entry points):
  1. matcher/data axis, weak scaling — each process matches its own
     pair; collectives: the evaldisp psum. eff = T1 / Tn.
  2. matcher/tile axis, strong scaling — ONE pair's rows sharded across
     processes; collectives: ppermute halo exchange ACROSS PROCESSES.
     eff = T1 / (n * Tn). The warm-up rows each tile re-runs for the
     smoothing recurrence are real extra work (~12% at these shapes), so
     the structural ceiling is ~0.89, not 1.0.
  3. distributed Schur BA, weak scaling — BA_PTS_PER_PROC points per
     process, psum'd 6x6 camera system. eff = T1 / Tn.

Correctness across processes is asserted in-run: the tile-sharded
disparity is gathered and compared against the single-device matcher on
the same inputs (agreement), and the psum'd evaldisp must match the
local metric.

Writes MULTIHOST.json (gated by tests/test_multihost.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT_BASE = 12680
BA_PTS_PER_PROC = 32768
BA_BATCH_PAIRS = 8

# -- child ------------------------------------------------------------------



def _git_hash():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True).stdout.strip()
    except OSError:
        return "unknown"

def child_main(n: int, proc: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    sys.path.insert(0, REPO)

    from stereo_reconstruction_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", n, proc)
    assert jax.process_count() == n and jax.local_device_count() == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from stereo_reconstruction_tpu.config import (
        BundleAdjustmentConfig,
        MatcherConfig,
    )
    from stereo_reconstruction_tpu.ops import geometry as geo
    from stereo_reconstruction_tpu.ops.block_search import block_search_right
    from stereo_reconstruction_tpu.ops.metrics import evaldisp
    from stereo_reconstruction_tpu.parallel import (
        distributed_bundle_adjust,
        distributed_bundle_adjust_batch,
        sharded_block_search_right,
        sharded_evaldisp,
    )

    rng = np.random.default_rng(7)  # identical stream on every process
    cfg = MatcherConfig(block_size=11, min_disparity=0, max_disparity=64,
                        backend="xla")
    report = {}

    def timed(fn, reps=3):
        fn()  # compile + warm
        multihost_utils.sync_global_devices("timer")
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- 1. data axis: one pair per process (weak) ----
    H, W = 256, 320
    mesh = multihost.global_mesh(data=n, tile=1)
    full_l = rng.integers(1, 255, (n, H, W, 3)).astype(np.float32)
    full_r = rng.integers(1, 255, (n, H, W, 3)).astype(np.float32)
    spec = P("data", None, None, None)
    gl = multihost.from_local_shards(full_l[proc:proc + 1], mesh, spec)
    gr = multihost.from_local_shards(full_r[proc:proc + 1], mesh, spec)
    gt = multihost.from_local_shards(
        rng.uniform(0, 64, (n, H, W)).astype(np.float32)[proc:proc + 1],
        mesh, P("data", None, None))
    mask = multihost.from_local_shards(
        np.full((1, H, W), 255, np.uint8), mesh, P("data", None, None))

    def step_data():
        d = sharded_block_search_right(gl, gr, mesh, cfg)
        m = sharded_evaldisp(d, gt, mask, mesh, bad_thresh=2.0, max_disp=64.0)
        jax.block_until_ready(m["bad_percent"])
        return d, m

    report["matcher_data_s"] = timed(lambda: step_data())

    # cross-process metric correctness: psum'd evaldisp == local evaldisp
    d_g, m_g = step_data()
    d_all = np.asarray(multihost_utils.process_allgather(d_g, tiled=True))
    gt_all = np.asarray(multihost_utils.process_allgather(gt, tiled=True))
    local_bad = float(evaldisp(
        jnp.asarray(d_all.reshape(-1, W)), jnp.asarray(gt_all.reshape(-1, W)),
        jnp.full((n * H, W), 255, jnp.uint8), 2.0, 64.0)["bad_percent"])
    report["evaldisp_psum_abs_diff"] = abs(float(m_g["bad_percent"]) - local_bad)

    # ---- 2. tile axis: one pair, rows sharded (strong) ----
    Ht = 512
    mesh_t = multihost.global_mesh(data=1, tile=n)
    pair_l = rng.integers(1, 255, (1, Ht, W, 3)).astype(np.float32)
    pair_r = rng.integers(1, 255, (1, Ht, W, 3)).astype(np.float32)
    rows = Ht // n
    spec_t = P("data", "tile", None, None)
    tl = multihost.from_local_shards(
        pair_l[:, proc * rows:(proc + 1) * rows], mesh_t, spec_t)
    tr = multihost.from_local_shards(
        pair_r[:, proc * rows:(proc + 1) * rows], mesh_t, spec_t)

    def step_tile():
        d = sharded_block_search_right(tl, tr, mesh_t, cfg, warmup=16)
        jax.block_until_ready(d)
        return d

    report["matcher_tile_s"] = timed(lambda: step_tile())

    # cross-process halo correctness: gathered sharded disparity vs the
    # single-device matcher on the same pair
    d_ref = np.asarray(block_search_right(
        jnp.asarray(pair_l[0]), jnp.asarray(pair_r[0]), cfg))

    d_t = np.asarray(
        multihost_utils.process_allgather(step_tile(), tiled=True))[0]
    report["tile_agreement"] = float(np.mean(d_t == d_ref))

    # EXACT wavefront mode (VERDICT r3 item 6): the up-neighbor chain is
    # reseeded across tiles by ppermuted boundary rows — bit-identical to
    # the single device at the cost of n_tiles re-runs of the cheap
    # smoothing scan; the timing pair quantifies that overhead
    def step_tile_exact():
        d = sharded_block_search_right(tl, tr, mesh_t, cfg, exact=True)
        jax.block_until_ready(d)
        return d

    report["matcher_tile_exact_s"] = timed(lambda: step_tile_exact())
    d_e = np.asarray(
        multihost_utils.process_allgather(step_tile_exact(), tiled=True))[0]
    report["tile_agreement_exact"] = float(np.mean(d_e == d_ref))

    # ---- 3. distributed Schur BA (weak scaling) ----
    # 3a. single problem (worst case: every LM iteration's two psums sit
    #     alone on the critical path)
    pts_per = BA_PTS_PER_PROC
    N = pts_per * n
    K = np.array([[300.0, 0, 80], [0, 300.0, 64], [0, 0, 1]])
    aa = np.array([0.02, -0.03, 0.01])
    R = np.asarray(geo.angle_axis_to_rotation(jnp.asarray(aa)))
    T = np.array([-0.5, 0.02, 0.1])
    depths = rng.uniform(4, 8, N).astype(np.float32)
    xl = np.concatenate(
        [rng.uniform(-0.2, 0.2, (2, N)).astype(np.float32), np.ones((1, N), np.float32)])
    pts = (xl * depths[None, :]).astype(np.float32)
    pts_r = R @ pts + T[:, None]
    kp_l = (K @ (pts / pts[2])).astype(np.float32)
    kp_r = (K @ (pts_r / pts_r[2])).astype(np.float32)

    sl = slice(proc * pts_per, (proc + 1) * pts_per)
    spec_pts = P(None, ("data", "tile"))
    g_kpl = multihost.from_local_shards(kp_l[:, sl], mesh, spec_pts)
    g_kpr = multihost.from_local_shards(kp_r[:, sl], mesh, spec_pts)
    g_X0 = multihost.from_local_shards(
        pts[:, sl] + 0.02, mesh, spec_pts)
    g_w = multihost.from_local_shards(
        np.ones(pts_per, np.float32), mesh, P(("data", "tile")))
    R0 = geo.angle_axis_to_rotation(jnp.asarray(aa + 0.02))

    def step_ba():
        res = distributed_bundle_adjust(
            g_kpl, g_kpr, jnp.asarray(K), jnp.asarray(K),
            init_rotation=R0, init_translation=jnp.asarray(T + 0.05),
            init_points=g_X0, mesh=mesh, weights=g_w,
            config=BundleAdjustmentConfig(max_iterations=10),
        )
        jax.block_until_ready(res.pose)
        return res

    report["ba_single_s"] = timed(lambda: step_ba())
    res = step_ba()
    report["ba_cost_ratio"] = float(res.final_cost) / max(
        float(res.initial_cost), 1e-12)

    # 3b. the PRODUCTION pattern (VERDICT r3 item 7): B pairs' two-view
    #     BAs as one vmapped LM — all B Schur systems ride one fused psum
    #     per iteration, dividing the per-pair collective cost by B
    B = BA_BATCH_PAIRS
    rng_b = np.random.default_rng(11)
    kpl_b = np.empty((B, 3, N), np.float32)
    kpr_b = np.empty((B, 3, N), np.float32)
    pts_b = np.empty((B, 3, N), np.float32)
    R0_b = np.empty((B, 3, 3), np.float32)
    T0_b = np.empty((B, 3), np.float32)
    for bi in range(B):
        aa_i = aa * (1.0 + 0.1 * bi)
        R_i = np.asarray(geo.angle_axis_to_rotation(jnp.asarray(aa_i)))
        T_i = T + 0.02 * bi
        d_i = rng_b.uniform(4, 8, N).astype(np.float32)
        xl_i = np.concatenate([
            rng_b.uniform(-0.2, 0.2, (2, N)).astype(np.float32),
            np.ones((1, N), np.float32)])
        p_i = (xl_i * d_i[None, :]).astype(np.float32)
        pr_i = R_i @ p_i + T_i[:, None]
        kpl_b[bi] = K @ (p_i / p_i[2])
        kpr_b[bi] = K @ (pr_i / pr_i[2])
        pts_b[bi] = p_i + 0.02
        R0_b[bi] = np.asarray(
            geo.angle_axis_to_rotation(jnp.asarray(aa_i + 0.02)))
        T0_b[bi] = T_i + 0.05

    spec_b = P(None, None, ("data", "tile"))
    gb_kpl = multihost.from_local_shards(kpl_b[:, :, sl], mesh, spec_b)
    gb_kpr = multihost.from_local_shards(kpr_b[:, :, sl], mesh, spec_b)
    gb_X0 = multihost.from_local_shards(pts_b[:, :, sl], mesh, spec_b)

    def step_ba_batch():
        poses, F, c0, cf, X = distributed_bundle_adjust_batch(
            gb_kpl, gb_kpr, jnp.asarray(K), jnp.asarray(K),
            jnp.asarray(R0_b), jnp.asarray(T0_b), gb_X0, mesh,
            config=BundleAdjustmentConfig(max_iterations=10),
        )
        jax.block_until_ready(poses)
        return c0, cf

    report["ba_s"] = timed(lambda: step_ba_batch())
    report["ba_batch_pairs"] = B
    c0, cf = step_ba_batch()
    report["ba_batch_cost_ratio"] = float(
        np.max(np.asarray(cf) / np.maximum(np.asarray(c0), 1e-12)))

    multihost_utils.sync_global_devices("done")
    if proc == 0:
        print("CHILD_JSON " + json.dumps(report), flush=True)


# -- parent -----------------------------------------------------------------


def run_group(n: int, port: int) -> dict:
    procs = []
    taskset = shutil.which("taskset")
    ncores = os.cpu_count() or 1
    for i in range(n):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--child", str(i), "--n", str(n), "--port", str(port)]
        if taskset:
            cmd = [taskset, "-c", str(i % ncores)] + cmd
        env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env))
    # drain ALL children concurrently: a non-rank-0 child writing more
    # than the OS pipe buffer would otherwise block mid-collective and
    # drive the whole group into the timeout
    outs = [None] * n

    def drain(i, p):
        outs[i], _ = p.communicate(timeout=1200)

    ts = [threading.Thread(target=drain, args=(i, p), daemon=True)
          for i, p in enumerate(procs)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=1300)
    out0 = outs[0] or ""
    if any(p.returncode != 0 for p in procs):
        sys.stderr.write(out0[-4000:])
        raise RuntimeError(f"group n={n} failed")
    for line in out0.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    sys.stderr.write(out0[-4000:])
    raise RuntimeError("no CHILD_JSON from proc 0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--port", type=int, default=PORT_BASE)
    ap.add_argument("--ns", default="2,4",
                    help="comma-separated group sizes to run (vs a 1-proc "
                         "baseline)")
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST.json"))
    args = ap.parse_args()

    if args.child is not None:
        child_main(args.n, args.child, args.port)
        return

    ns = sorted({int(x) for x in args.ns.split(",") if x})
    ncores = os.cpu_count() or 1
    r1 = run_group(1, PORT_BASE + 1)
    groups = {}
    for j, n in enumerate(ns):
        groups[n] = run_group(n, PORT_BASE + 2 + j)

    def efficiency(n, rn):
        # With more processes than physical cores the processes time-slice
        # the cores, so the compute-bound weak-scaling ceiling is
        # cores/n, not 1.0 — record the raw number AND the ceiling so the
        # oversubscribed groups are honest (a TPU pod has a chip per
        # process; this host has 2 cores).
        ceiling = min(n, ncores) / n
        return {
            # weak scaling: same per-process work
            "matcher_data_weak": r1["matcher_data_s"] / rn["matcher_data_s"],
            # production pattern: B pairs' LMs share each iteration's psum
            "ba_weak": r1["ba_s"] / rn["ba_s"],
            # worst case: one problem, every psum alone on the chain
            "ba_single_weak": r1["ba_single_s"] / rn["ba_single_s"],
            # strong scaling: same global work split n ways
            "matcher_tile_strong":
                r1["matcher_tile_s"] / (n * rn["matcher_tile_s"]),
            "matcher_tile_exact_strong":
                r1["matcher_tile_exact_s"] / (n * rn["matcher_tile_exact_s"]),
            # exact wavefront cost relative to warmup-truncated mode
            "tile_exact_overhead":
                rn["matcher_tile_exact_s"] / rn["matcher_tile_s"],
            "core_ceiling": ceiling,
        }

    def correctness(rn):
        return {
            "tile_agreement_vs_single_device": rn["tile_agreement"],
            "tile_agreement_exact": rn["tile_agreement_exact"],
            "evaldisp_psum_abs_diff": rn["evaldisp_psum_abs_diff"],
            "ba_cost_ratio": rn["ba_cost_ratio"],
            "ba_batch_cost_ratio": rn["ba_batch_cost_ratio"],
        }

    # headline = the largest group that still has a core per process;
    # oversubscribed groups are recorded alongside with their ceiling
    n_head = max([n for n in ns if n <= ncores] or [min(ns)])
    report = {
        "backend": "cpu+gloo (jax.distributed, 1 device/process, "
                   "core-pinned)",
        "physical_cores": ncores,
        "processes": n_head,
        "group_sizes": ns,
        "baseline_1proc": r1,
        "efficiency": efficiency(n_head, groups[n_head]),
        "correctness": correctness(groups[n_head]),
    }
    for n in ns:
        report[f"group_{n}proc"] = groups[n]
        if n != n_head:
            report[f"efficiency_{n}proc"] = efficiency(n, groups[n])
            report[f"correctness_{n}proc"] = correctness(groups[n])
    with open(args.out, "w") as f:
        report["git"] = _git_hash()
        json.dump(report, f, indent=2)
    print(json.dumps(report["efficiency"]))
    print(json.dumps(report["correctness"]))


if __name__ == "__main__":
    main()
