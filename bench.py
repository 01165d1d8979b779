#!/usr/bin/env python3
"""Benchmark: rectified pairs/s/chip on the dense matcher path.

Prints a cumulative JSON line after EVERY completed section (the last
line is the most complete; each line is a full, valid record):
  {"metric": "rectified_pairs_per_s_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": R, "extra": {...}}

Headline: steady-state throughput of the dense rectified matching step
(Pallas cost volume + exact smoothness argmin) with the reference's
matcher settings (block 17, smoothing 0.9; src/main.cpp:40) on the real
Teddy pair at the BASELINE north-star evaluation resolution (trainingQ =
quarter res, D=100), batch 8 (single chip). ``--full`` benches half
resolution / D=200 instead (a different config — the two headline values
are not comparable; the config name is recorded in extra.config). The
baseline divisor is the BASELINE.json north-star target of 50
pairs/s/chip. Quality (bad-2.0 vs the exact reference-semantics oracle on
a crop) guards against fast-but-wrong kernels.

Evidence-first design (round-3 lesson: BENCH_r03 rc=124, zero numbers):
  * sections run cheapest-compile first and each one re-prints the full
    record as soon as it lands, so an external timeout can only truncate
    the tail, never erase the headline;
  * the matcher loop takes its trip count as a TRACED argument
    (lax.fori_loop with a dynamic bound), so K=1 and K=5 share ONE
    compiled program — halving the heaviest compile;
  * each later section has a wall-clock budget derived from the measured
    matcher compile time (cold cache => conservative estimates) and is
    skipped with a recorded reason when the budget doesn't cover it;
  * the steady-state batched number is ALWAYS recorded — when timing
    noise makes the marginal unmeasurable a noise flag is set instead of
    silently dropping the metric.

Timing notes (axon relay): each host->TPU call through the relay costs
~45 ms of fixed latency and identical executions are deduped remotely, so
per-call wall clock measures the relay, not the chip. The bench therefore
runs K batched matcher steps INSIDE one jit (inputs perturbed per step
AND per rep so nothing folds or dedupes), times K=1 vs K=5, and reports
the marginal per-step device time — the steady-state throughput a
pipelined producer sees. extra.ms_per_pair_single_call records the
per-call number (incl. relay) for comparability with round-1 records.

Roofline (extra.roofline): the measured marginal ms/pair against the
fused kernel's analytic HBM-bytes / VPU-ops / MXU-flops lower bounds
(utils/roofline.py), with the binding resource named — the r2-r4
"%-of-MXU-bf16-peak" headline was honest but meaningless for a kernel
that is VPU/HBM-shaped by design.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

TARGET_PAIRS_PER_S = 50.0  # BASELINE.json north_star
DATA_ROOT = "/root/reference/data/MiddEval3"


class Reporter:
    """Cumulative record; every flush prints one full JSON line."""

    def __init__(self, budget_s: float):
        self.t0 = time.perf_counter()
        self.budget = budget_s
        self.extra = {"sections": {}}
        self.value = 0.0

    def elapsed(self):
        return time.perf_counter() - self.t0

    def remaining(self):
        return self.budget - self.elapsed()

    def flush(self):
        self.extra["bench_elapsed_s"] = round(self.elapsed(), 1)
        print(json.dumps({
            "metric": "rectified_pairs_per_s_per_chip",
            "value": round(self.value, 4),
            "unit": "pairs/s",
            "vs_baseline": round(self.value / TARGET_PAIRS_PER_S, 4),
            "extra": self.extra,
        }), flush=True)

    def section(self, name, fn, est_s=0.0, required=False):
        """Run one bench section. Skips (with a recorded reason) when the
        remaining budget doesn't cover ``est_s``; records failures instead
        of propagating so later sections still run. Flushes after."""
        secs = self.extra["sections"]
        if not required and est_s > self.remaining():
            secs[name] = {"status": "skipped",
                          "reason": f"budget: est {est_s:.0f}s > "
                                    f"remaining {self.remaining():.0f}s"}
            self.flush()
            return False
        t0 = time.perf_counter()
        tries = 0
        while True:
            tries += 1
            try:
                fn()
                secs[name] = {"status": "ok",
                              "seconds": round(time.perf_counter() - t0, 1)}
                if tries > 1:
                    secs[name]["retried"] = tries - 1
                ok = True
                break
            except Exception as e:  # noqa: BLE001 — evidence over purity
                msg = f"{type(e).__name__}: {e}"
                # the axon relay's compile channel occasionally drops a
                # response mid-read ("INTERNAL: ... remote_compile");
                # the compile itself usually succeeded and is cached, so
                # ONE retry typically lands the section
                transient = ("remote_compile" in msg
                             and "INTERNAL" in msg and tries == 1
                             and self.remaining() > 60)
                if transient:
                    continue
                secs[name] = {"status": "error",
                              "seconds": round(time.perf_counter() - t0, 1),
                              "error": msg[:600]}
                ok = False
                break
        self.flush()
        return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="(kept for compat; trainingQ is the default)")
    ap.add_argument("--full", action="store_true",
                    help="bench half resolution / D=200 instead of trainingQ")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--backend", default="auto",
                    help="cost-volume backend: auto | pallas | xla")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--loop", type=int, default=5,
                    help="in-jit matcher steps for steady-state timing")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "700")),
                    help="total wall-clock budget (s); later sections are "
                         "skipped with a reason when it runs out. The "
                         "default must FINISH inside the driver's kill "
                         "window (~810 s: r3+r4 artifacts were rc 124 "
                         "there); 700 + the <=90 s worst overshoot of a "
                         "started section exits in time")
    ap.add_argument("--skip-pipeline", action="store_true",
                    help="skip the end-to-end pipeline measurements")
    ap.add_argument("--profile", action="store_true",
                    help="also capture a jax.profiler trace of the matcher "
                         "loop (best-effort through the relay)")
    args = ap.parse_args()
    if args.quick and args.full:
        ap.error("--quick and --full are mutually exclusive")
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp
    from jax import lax

    from stereo_reconstruction_tpu.config import MatcherConfig
    from stereo_reconstruction_tpu.ops.block_search import block_search_right
    from stereo_reconstruction_tpu.ops.metrics import evaldisp
    from stereo_reconstruction_tpu import oracle

    rep = Reporter(args.budget)
    dev = jax.devices()[0]
    rep.extra["platform"] = dev.platform

    # ---------------------------------------------------------------- load
    state = {}

    def sec_load():
        pair = None
        if os.path.isdir(DATA_ROOT):
            from stereo_reconstruction_tpu.data import MiddEval3
            from stereo_reconstruction_tpu.data.middeval3 import \
                downsample_pair
            pair = MiddEval3(DATA_ROOT).load_training(13)  # Teddy (real GT)
            if not args.full:
                import dataclasses as _dc

                qpair = downsample_pair(pair)   # trainingQ, north-star res
                L = np.asarray(qpair.image_left, np.uint8)
                R = np.asarray(qpair.image_right, np.uint8)
                # uint8 pipeline inputs: the real MiddEval3 trainingQ
                # dataset ships uint8 PNGs (the f32 quarter-integer means
                # are our downsampler's artifact), and uint8 halves every
                # host->device image transfer on the bandwidth-bound
                # relay (pipeline_batch _compact_images keeps the dtype)
                qpair = _dc.replace(qpair, image_left=L, image_right=R)
            else:
                qpair = None
                L = np.asarray(pair.image_left, np.uint8)[::2, ::2]
                R = np.asarray(pair.image_right, np.uint8)[::2, ::2]
        else:
            rng = np.random.default_rng(0)
            qpair = None
            L = rng.integers(1, 255, (750, 900, 3), np.uint8)
            R = rng.integers(1, 255, (750, 900, 3), np.uint8)
        state.update(pair=pair, qpair=qpair, L=L, R=R)

    rep.section("load", sec_load, required=True)
    L, R = state["L"], state["R"]
    h, w = R.shape[:2]
    cfg = MatcherConfig(
        block_size=17,
        min_disparity=0,
        max_disparity=200 if args.full else 100,
        smooth_factor=0.9,
        row_smooth_iters=2,
        backend=args.backend,
    )
    B = args.batch
    rep.extra.update({
        "config": "half_D200" if args.full else "trainingQ_D100",
        "backend": cfg.backend,
        "image": f"{h}x{w}",
        "batch": B,
        "max_disparity": cfg.max_disparity,
    })

    # ------------------------------------------------- matcher (headline)
    Lb = jax.device_put(jnp.stack([jnp.asarray(L, jnp.float32)] * B), dev)
    Rb = jax.device_put(jnp.stack([jnp.asarray(R, jnp.float32)] * B), dev)
    step = jax.vmap(lambda l, r: block_search_right(l, r, cfg))

    # ONE compiled program serves every K: the trip count is traced, and
    # the per-rep `off` perturbation defeats the relay's dedup cache.
    @jax.jit
    def looped(k, off):
        def body(i, acc):
            d = step(Lb + off + 0.25 * (1.0 + i.astype(jnp.float32)), Rb)
            return acc + d[0, 0, 0] + d[-1, -1, -1]
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    def sec_matcher_compile():
        t0 = time.perf_counter()
        _ = float(looped(1, jnp.float32(-7.0)))
        compile_s = time.perf_counter() - t0
        rep.extra["compile_seconds"] = round(compile_s, 2)
        state["compile_s"] = compile_s
        # provisional headline from one timed single call (incl. relay)
        t0 = time.perf_counter()
        _ = float(looped(1, jnp.float32(-6.0)))
        t1 = time.perf_counter() - t0
        rep.extra["ms_per_pair_single_call"] = round(t1 / B * 1000, 2)
        rep.value = B / t1
        rep.extra["headline_kind"] = "single_call_provisional"

    rep.section("matcher_compile", sec_matcher_compile, required=True)

    def sec_matcher_steady():
        K = args.loop
        _ = float(looped(K, jnp.float32(-5.0)))      # warm K-path
        t1s, tKs = [], []
        for i in range(args.reps):
            off = jnp.float32(17.0 * (i + 1))
            t0 = time.perf_counter()
            _ = float(looped(1, off))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = float(looped(K, off + 1000.0))
            tKs.append(time.perf_counter() - t0)
        per_step = (min(tKs) - min(t1s)) / (K - 1)
        per_pair = per_step / B
        state["per_pair"] = per_pair
        rep.extra["ms_per_pair"] = round(per_pair * 1000, 3)
        rep.extra["ms_per_pair_single_call"] = round(
            min(t1s) / B * 1000, 2)
        rep.value = 1.0 / per_pair
        rep.extra["headline_kind"] = "steady_state_marginal"

    rep.section("matcher_steady", sec_matcher_steady, required=True)
    # "cold" = the persistent compilation cache did not serve this
    # process: true cold compiles of the matcher program run 170-900 s
    # through the relay, while cache-served runs land at 30-90 s
    # (deserialize + remote load). The old 60 s threshold misclassified
    # ordinary relay jitter as cold and skipped half the bench (r5).
    cold = state.get("compile_s", 0.0) > 150.0

    def sec_matcher_static():
        # static trip counts let XLA unroll + software-pipeline the K
        # steps (ILP across iterations) — the throughput a pipelined
        # producer sees, and the method behind the r2-recorded headline.
        # Costs one extra compile per trip count, so it runs as an
        # upgrade after the dynamic-loop headline is already on record.
        K = args.loop

        def looped_static(k):
            def body(i, acc):
                d = step(Lb + 0.25 * (1.0 + i.astype(jnp.float32)), Rb)
                return acc + d[0, 0, 0] + d[-1, -1, -1]
            # the traced ``off`` seeds the accumulator so every call is
            # unique to the relay's dedup cache
            return jax.jit(lambda off: lax.fori_loop(0, k, body, off))

        f1s, fKs = looped_static(1), looped_static(K)
        _ = float(f1s(jnp.float32(0.0)))
        _ = float(fKs(jnp.float32(0.0)))
        t1s, tKs = [], []
        for i in range(args.reps):
            off = jnp.float32(0.001 * (i + 1))
            t0 = time.perf_counter()
            _ = float(f1s(off))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = float(fKs(off))
            tKs.append(time.perf_counter() - t0)
        per_pair = (min(tKs) - min(t1s)) / (K - 1) / B
        if per_pair > 0:
            rep.extra["ms_per_pair_static"] = round(per_pair * 1000, 3)
            rep.value = max(rep.value, 1.0 / per_pair)
            rep.extra["headline_kind"] = "steady_state_marginal_static"

    # (registered at the END: a ~1% headline upgrade must not spend
    # budget before the novel pipeline sections — r5 driver-window math)

    # -------------------- analytic roofline of the fused matcher (r4 #4)
    def sec_roofline():
        """Measured ms/pair against the kernel's HBM/VPU/MXU lower bounds
        (utils/roofline.py) with the binding resource named — replacing
        the r2-r4 '%-of-MXU-bf16-peak' headline, which reads ~0 for a
        VPU/HBM-shaped kernel no matter how good it is."""
        from stereo_reconstruction_tpu.utils import roofline as rl
        rep.extra["roofline"] = rl.report(
            state["per_pair"] * 1000, h, w, cfg.max_disparity,
            cfg.block_size)

    rep.section("roofline", sec_roofline, est_s=2)

    # -------------------------------------------------------- quality gate
    def sec_quality():
        crop = (slice(100, 180), slice(100, 356))
        Lc, Rc = L[crop], R[crop]
        disp_crop = np.asarray(block_search_right(
            jnp.asarray(Lc), jnp.asarray(Rc),
            MatcherConfig(block_size=17, max_disparity=48, smooth_factor=0.9,
                          row_smooth_iters=2, backend=args.backend)))
        ref_crop = oracle.block_search_right_fast(Lc, Rc, 17, 0, 48, 0.9)
        m = evaldisp(
            jnp.asarray(disp_crop),
            jnp.asarray(ref_crop.astype(np.float32)),
            jnp.asarray(np.where(ref_crop > 0, 255, 0).astype(np.uint8)),
            bad_thresh=2.0)
        rep.extra["bad2_vs_reference_oracle_crop"] = round(
            float(m["bad_percent"]), 4)
        rep.extra["oracle_exact_agreement_crop"] = round(
            float((disp_crop == ref_crop).mean()), 5)

    rep.section("quality_guard", sec_quality, est_s=120 if cold else 20)

    # ------------------------------------------- end-to-end pipeline (1 pair)
    qpair = state.get("qpair")
    pipeline_ok = (qpair is not None and not args.full
                   and not args.skip_pipeline)
    pcfg = None
    if pipeline_ok:
        from stereo_reconstruction_tpu.config import PipelineConfig
        pcfg = PipelineConfig()
        pcfg = pcfg.replace(
            matcher=dataclasses.replace(pcfg.matcher, max_disparity=100,
                                        backend=args.backend),
            recon=dataclasses.replace(pcfg.recon, outlier_kernel=251),
        )

    def _preseed_band():
        # pre-seed the sticky warp-band class at a pessimistic (16, 32):
        # every distinct class is a fresh multi-minute relay compile of
        # the dense program, and per-batch pose jitter can still grow
        # past the auto-bumped first class mid-stream (r4d: 1880 s of
        # steady-section recompiles; r5 measured the same failure at
        # (8, 16): one perturbed-input pose crossed the class mid-warm
        # and steady_batches cost 612 s instead of ~350 — a fresh
        # process pays ONE unavoidable compile, this preseed must make
        # it exactly one). Exceeding (16, 32) would take a near-45deg
        # rectification never produced on this dataset; the extra taps
        # are exact zero-weight work worth a few ms/batch.
        from stereo_reconstruction_tpu import pipeline_batch as pb
        from stereo_reconstruction_tpu.rectify.rectifier import \
            static_canvas
        hmax = h + (-h) % 8
        wmax = w + (-w) % 128
        canvas = static_canvas((hmax, wmax), (hmax, wmax), pcfg.rectify)
        pb._BAND_CACHE[(hmax, wmax, canvas, pcfg)] = (16, 32)

    def sec_full_pipeline():
        from stereo_reconstruction_tpu.pipeline import run_pair
        run_pair(qpair, pcfg)                # compile pass
        res = run_pair(qpair, pcfg)          # warm pass
        total = sum(res.timings.values())
        rep.extra["full_pipeline_s"] = round(total, 3)
        rep.extra["full_pipeline_pairs_per_s"] = round(1.0 / total, 3)
        rep.extra["full_pipeline_stages_ms"] = {
            k: round(v * 1000, 1) for k, v in res.timings.items()}

    # ------------------------------------- batched pipeline (B pairs, 2 progs)
    def sec_batch_pipeline():
        from stereo_reconstruction_tpu.pipeline_batch import run_batch
        _preseed_band()
        batch = [qpair] * B
        run_batch(batch, pcfg)               # compile pass
        t0 = time.perf_counter()
        bres = run_batch(batch, pcfg)        # warm pass
        bt = time.perf_counter() - t0
        rep.extra["batch_pipeline_pairs_per_s"] = round(B / bt, 3)
        rep.extra["batch_pipeline_stages_ms"] = {
            k: round(v * 1000, 1) for k, v in bres.timings.items()}
        rep.extra["batch_pipeline_bad2_gt"] = round(
            float(bres.metrics[0].get("bad_percent", -1.0)), 3)
        rep.flush()
        # metrics + disparity only (no depth download): the scoring path
        run_batch(batch, pcfg, fetch_depth=False)
        t0 = time.perf_counter()
        run_batch(batch, pcfg, fetch_depth=False)
        rep.extra["batch_pipeline_pairs_per_s_nodepth"] = round(
            B / (time.perf_counter() - t0), 3)

    # ----------------------- steady-state software-pipelined batch stream
    def sec_steady_batches():
        from stereo_reconstruction_tpu.pipeline_batch import run_batches
        _preseed_band()
        KB = 4

        u8l = np.asarray(qpair.image_left, np.uint8)
        u8r = np.asarray(qpair.image_right, np.uint8)

        def perturbed(k):
            # distinct pixels per batch (the relay dedupes identical
            # executions); the uint8 wraparound add keeps the upload
            # dtype — and therefore the compiled device programs —
            # matching the batch_pipeline section exactly (a dtype
            # change forces two fresh ~200 s relay compiles)
            return [dataclasses.replace(
                qpair,
                image_left=u8l + np.uint8(k + 1),
                image_right=u8r + np.uint8(k + 1),
            )] * B

        run_batches([perturbed(k) for k in range(KB)], pcfg,
                    fetch_depth=False)                        # warm all
        t0 = time.perf_counter()
        run_batches([perturbed(KB)], pcfg, fetch_depth=False)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_batches([perturbed(KB + 1 + k) for k in range(KB)], pcfg,
                    fetch_depth=False)
        tK = time.perf_counter() - t0
        # ALWAYS record (r3 weakness 6): marginal when measurable, else
        # the absolute K-batch throughput with an explicit noise flag.
        if tK > t1:
            rep.extra["batch_pipeline_pairs_per_s_steady"] = round(
                (KB - 1) * B / (tK - t1), 3)
            rep.extra["steady_timing_noise"] = False
        else:
            rep.extra["batch_pipeline_pairs_per_s_steady"] = round(
                KB * B / tK, 3)
            rep.extra["steady_timing_noise"] = True
        rep.extra["steady_raw_s"] = {"t_1batch": round(t1, 3),
                                     "t_4batch": round(tK, 3)}

    # ------------------- device-bound pipeline throughput (no relay)
    def sec_device_pipeline():
        """In-jit K-loop marginals of the two batched device programs:
        the end-to-end throughput the CHIP sustains when transfers
        overlap (the axon relay's 23 MB/s link transfer-binds the
        system-level run_batches number; real TPU hosts move images at
        GB/s, so the device-bound number is the portable one)."""
        from stereo_reconstruction_tpu.pipeline_batch import (
            _dense_batch,
            _pose_batch,
        )
        from stereo_reconstruction_tpu.rectify.rectifier import static_canvas

        hmax = h + (-h) % 8
        wmax = w + (-w) % 128
        Lp = np.zeros((hmax, wmax, 3), np.float32)
        Rp = np.zeros((hmax, wmax, 3), np.float32)
        Lp[:h, :w] = L
        Rp[:h, :w] = R
        Lb8 = jnp.stack([jnp.asarray(Lp)] * B)
        Rb8 = jnp.stack([jnp.asarray(Rp)] * B)
        KLb = jnp.stack([jnp.asarray(qpair.intrinsics_left)] * B)
        KRb = jnp.stack([jnp.asarray(qpair.intrinsics_right)] * B)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.key(0), jnp.arange(B))
        canvas = static_canvas((hmax, wmax), (hmax, wmax), pcfg.rectify)
        Hn = np.eye(3, dtype=np.float32)
        Hn[0, 2] = 1.5
        Hb = jnp.stack([jnp.asarray(Hn)] * B)
        ok = jnp.ones((B,), bool)

        def marginal(make_body, K=3):
            @jax.jit
            def looped(k, off):
                def body(i, acc):
                    return acc + make_body(
                        off + 0.25 * (1 + i.astype(jnp.float32)))
                return lax.fori_loop(0, k, body, jnp.float32(0.0))

            _ = float(looped(1, jnp.float32(-3.0)))
            _ = float(looped(K, jnp.float32(-2.0)))
            t1s, tKs = [], []
            for r in range(args.reps):
                off = jnp.float32(9.0 * (r + 1))
                t0 = time.perf_counter()
                _ = float(looped(1, off))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                _ = float(looped(K, off + 300.0))
                tKs.append(time.perf_counter() - t0)
            return (min(tKs) - min(t1s)) / (K - 1)

        pose_s = marginal(lambda off: _pose_batch(
            keys, Lb8 + off, Rb8, KLb, KRb, pcfg
        ).reproj_error_ba[0] + 0.0)
        dense_s = marginal(lambda off: _dense_batch(
            Lb8 + off, Rb8, Hb, Hb, KRb, ok, pcfg, canvas,
            (hmax, wmax), (8, 16))[0][0, 0, 0])
        rep.extra["device_pose_ms_per_pair"] = round(pose_s / B * 1000, 2)
        rep.extra["device_dense_ms_per_pair"] = round(dense_s / B * 1000, 2)
        rep.extra["device_pipeline_pairs_per_s"] = round(
            B / (pose_s + dense_s), 2)

    # ------------------------ config-2 matcher (the reference's own
    # operating point: half resolution, D=200 — src/main.cpp:40; r4 #9)
    def sec_halfres_matcher():
        if args.full or state.get("pair") is None:
            raise RuntimeError("needs full-res source images")
        L2 = np.asarray(state["pair"].image_left, np.uint8)[::2, ::2]
        R2 = np.asarray(state["pair"].image_right, np.uint8)[::2, ::2]
        cfg2 = dataclasses.replace(cfg, max_disparity=200)
        B2 = 4
        L2b = jnp.stack([jnp.asarray(L2, jnp.float32)] * B2)
        R2b = jnp.stack([jnp.asarray(R2, jnp.float32)] * B2)
        step2 = jax.vmap(lambda l, r: block_search_right(l, r, cfg2))

        @jax.jit
        def looped2(k, off):
            def body(i, acc):
                d = step2(L2b + off + 0.25 * (1.0 + i.astype(jnp.float32)),
                          R2b)
                return acc + d[0, 0, 0] + d[-1, -1, -1]
            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        K = 3
        t0 = time.perf_counter()
        _ = float(looped2(1, jnp.float32(-4.0)))
        compile2 = time.perf_counter() - t0
        _ = float(looped2(K, jnp.float32(-3.0)))
        t1s, tKs = [], []
        for i in range(args.reps):
            off = jnp.float32(13.0 * (i + 1))
            t0 = time.perf_counter()
            _ = float(looped2(1, off))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = float(looped2(K, off + 500.0))
            tKs.append(time.perf_counter() - t0)
        per_pair2 = (min(tKs) - min(t1s)) / (K - 1) / B2
        from stereo_reconstruction_tpu.utils import roofline as rl
        rep.extra["halfres_matcher"] = {
            "config": "half_D200",
            "image": f"{L2.shape[0]}x{L2.shape[1]}",
            "batch": B2,
            "compile_seconds": round(compile2, 1),
            "ms_per_pair": round(per_pair2 * 1000, 3),
            "pairs_per_s": round(1.0 / per_pair2, 2),
            "roofline": rl.report(per_pair2 * 1000, L2.shape[0],
                                  L2.shape[1], 200, cfg2.block_size),
        }

    # ---- section order (r4 #1/#2): after the always-on matcher+quality
    # sections, run the two NOVEL measurements the r3/r4 driver kills
    # lost (device_pipeline, steady_batches) BEFORE the already-recorded
    # batch/full pipeline repeats, then the config-2 point. Estimates are
    # deliberately pessimistic when the matcher compile indicated a cold
    # cache — the budget machinery must finish and exit, not be killed.
    # measured r5 section costs (uncontended): device ~131-137 s fresh
    # (its programs compile fast since the fori-loop graph shrink),
    # steady ~340-360 s with the (16, 32) preseed (ONE pose+dense
    # compile — the axon backend does not serialize executables to the
    # persistent cache, so every fresh process pays it; a mid-warm band
    # recompile at the old (8, 16) preseed pushed it to 612 s), batch
    # ~60 s once steady compiled the shared programs, full ~180 s,
    # halfres ~20-80 s.
    if pipeline_ok:
        rep.section("device_pipeline", sec_device_pipeline,
                    est_s=500 if cold else 150)
        rep.section("steady_batches", sec_steady_batches,
                    est_s=600 if cold else 460)
        batch_warm = (rep.extra["sections"].get("steady_batches", {})
                      .get("status") == "ok")
        rep.section("batch_pipeline", sec_batch_pipeline,
                    est_s=(60 if batch_warm else 330) if not cold else 540)
        rep.section("full_pipeline", sec_full_pipeline,
                    est_s=200 if cold else 40)
    if not args.full:
        rep.section("halfres_matcher", sec_halfres_matcher,
                    est_s=300 if cold else 90)
    rep.section("matcher_static", sec_matcher_static,
                est_s=500 if cold else 40)

    # ------------------------------------------------------------- profile
    def sec_profile():
        trace_dir = "/tmp/stpu_trace"
        with jax.profiler.trace(trace_dir):
            _ = float(looped(args.loop, jnp.float32(99.0)))
        rep.extra["trace_dir"] = trace_dir

    if args.profile:
        rep.section("profile_trace", sec_profile, est_s=30)

    rep.flush()


if __name__ == "__main__":
    main()
