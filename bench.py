"""Benchmark: batched EKF-SLAM steps/sec/chip at 100-landmark capacity.

North-star metric (BASELINE.json / BASELINE.md): >= 10,000 batched EKF-SLAM
steps/sec/chip at capacity 100. One "step" = ONE full SLAM frame for ONE
filter instance — the entire mono_slam.m per-frame pipeline (map management,
EKF predict, measurement prediction + Jacobians + per-slot innovation
covariances, chi^2 IC gating, 64-hypothesis 1-point RANSAC, low-innovation
update, high-innovation rescue + second update, counter bookkeeping and
masked feature initialization).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 10_000 (the driver-set target; the reference itself
publishes no numbers, SURVEY.md §6).
"""

import json
import os
import sys
import time

# Fast-mode default precision must be set BEFORE ekf.py is imported (it
# reads EKF_COV_PRECISION at module load). BENCH_MODE=pixels and explicit
# env settings override.
if os.environ.get("BENCH_MODE", "sim") != "pixels":
    os.environ.setdefault("EKF_COV_PRECISION", "tensorfloat32")

# Form optima are STORAGE-DTYPE-DEPENDENT (docs/BENCH.md r3c/r3e): on
# the f32 parity program P passes cost 2x the bf16 bytes, so the
# deferred single-apply tail + natural-layout row/diag selections win
# (10,187.1 vs the 9,095.9 plain-f32 baseline, runs/r3e) where they
# lose or tie on the bf16 program. Defaulting them here keeps
# `BENCH_PSTORE=f32 python bench.py` at the measured f32 optimum; all
# three forms are bit-pinned to the default lowerings by tests.
if (os.environ.get("BENCH_PSTORE") == "f32"
        and os.environ.get("BENCH_MODE", "sim") != "pixels"):
    os.environ.setdefault("EKF_DEFER", "1")
    os.environ.setdefault("EKF_MGROWS", "rowsel")
    os.environ.setdefault("EKF_SDIAG", "dotsel")
    # The f32 batch knee sits at B=128, not the bf16 program's 256: the
    # r3p coarse sweep first showed it and the r4 fine sweep (B in
    # {96,112,128,144,160}, best-of-3 at the argmax) confirmed 128 at
    # 10,840 +- 5 steps/s vs ~10,246 at 256 (docs/BENCH.md r4).
    # "The optimum MOVES after any update-cost change" — and after any
    # storage-dtype change (docs/BACKLOG.md #4).
    os.environ.setdefault("BENCH_BATCH", "128")

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import (EngineConfig, FilterConfig, MapConfig,
                                 SimConfig)
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

BATCH = int(os.environ.get("BENCH_BATCH", "256"))  # instances per chip
FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))  # frames per timed run
TARGET = 10_000.0  # steps/sec/chip (BASELINE.json north star)


def ensemble_ate(traj, xs):
    """Per-instance SE(3)-aligned ATE RMSE quantiles over the Monte-Carlo
    ensemble (utils/trajectory.py Umeyama alignment — the standard SLAM
    accuracy summary, reported next to the raw unaligned tracking error).
    Computed ON HOST CPU from fetched arrays so no extra TPU program
    compiles into the timed path (every distinct jitted program costs
    minutes through the tunnel)."""
    from ekf_slam_tpu.utils import trajectory as _traj
    traj_h = jax.device_get(traj)
    xs_h = jax.device_get(xs)
    with jax.default_device(jax.devices("cpu")[0]):
        ates = jax.vmap(
            lambda t: _traj.ate_rmse(t[:, 0:3], xs_h[:, 0:3]))(
            traj_h[..., 0:7])
        ates = jax.device_get(ates)
    import numpy as _np
    return (float(_np.median(ates)), float(_np.percentile(ates, 95)),
            float(_np.max(ates)))


def _stagger_chains(default: str = "0") -> int:
    """BENCH_STAGGER: 0 = plain vmap driver; 1 = the original two-half
    software-pipelined driver (legacy spelling); k>=2 = k chains of
    BATCH/k each (engine.staggered_chains_drive)."""
    v = int(os.environ.get("BENCH_STAGGER", default))
    return 2 if v == 1 else v


def main_pixels():
    """Image-path variant (BENCH_MODE=pixels): full step_image pipeline —
    template warp + NCC/descriptor matching + FAST init + the filter — on
    pre-rendered frames (rendering is sim-only overhead and excluded).
    Smaller batch: the front-end adds ~25 MFLOP/step of sliding-window
    work per instance."""
    from ekf_slam_tpu.config import VisionConfig
    from ekf_slam_tpu.vision import frontend

    # Pixels defaults = the measured round-2 optimum per matcher.
    # descriptor (engine default): four 16-chains, software-pipelined
    # (2,535.1 vs 2,324.6 unstaggered; r2q/r2r queues) — the 8-chain
    # (2,331.0) and PIXB=128 variants lose (total batch past the
    # image-path knee). ncc: unstaggered PIXB=32 (2,585.9; stagger=4
    # at PIXB=64 measured 2,082.9 in r2r). Env vars override both.
    # Attribution knobs (EKF_ABLATE / EKF_DEFER / EKF_UPDATE=rows) are
    # not phase-splittable: the stagger DEFAULT falls back to the plain
    # vmap driver for them (an explicit BENCH_STAGGER still errors).
    matcher = os.environ.get("BENCH_MATCHER", "descriptor")
    stag_dflt = "4" if matcher == "descriptor" else "0"
    if stag_dflt != "0" and not frontend.image_phase_split_supported(
            EngineConfig()):
        stag_dflt = "0"
    chains = _stagger_chains(default=stag_dflt)
    # PIXB default follows the RESOLVED chain count: 16 per chain at the
    # staggered optimum, 32 unstaggered (the image-path batch knee) —
    # so BENCH_STAGGER=0 with the descriptor matcher benches the
    # measured unstaggered optimum, not a stale coupled default.
    pixb_dflt = str(16 * chains) if chains >= 2 else "32"
    b = int(os.environ.get("BENCH_PIXB", pixb_dflt))
    if chains and b % chains:
        sys.exit(f"BENCH_PIXB={b} is not divisible by the stagger chain "
                 f"count {chains} — set BENCH_PIXB to a multiple of "
                 f"BENCH_STAGGER (or BENCH_STAGGER=0)")
    cap = int(os.environ.get("BENCH_CAP", "100"))
    cfg = EngineConfig(
        filter=FilterConfig(gain_solver=os.environ.get("BENCH_GAIN",
                                                       "newton")),
        map=MapConfig(capacity=cap, min_features_in_image=25,
                      max_new_per_step=10, max_update_obs=64),
        vision=VisionConfig(
            matcher=matcher,
            search_radius=int(os.environ.get("BENCH_R", "12")),
            corners_per_window=int(os.environ.get("BENCH_C", "8")),
            warp_distortion=os.environ.get("BENCH_WARPDIST", "affine")),
        sim=SimConfig(num_landmarks=128),
        dtype="float32")
    scn, xs, _ = simulate(jax.random.key(0), cfg, FRAMES)
    render = jax.jit(frontend.render_scene_image, static_argnames="cfg")
    imgs = jnp.stack([render(scn, xs[t], cfg) for t in range(FRAMES)])

    st0 = init_state(cfg)
    app0 = frontend.init_appearance(cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), st0)
    app_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape),
                         app0)

    # BENCH_STAGGER=k (resolved above): software-pipelined k-chain driver
    # — the matcher (phase 1) of one chain schedules against the updates
    # (phase 2) of another; bit-identical per-instance math
    # (tests/test_vision.py). "1" = the original two-half driver;
    # k>=2 = k chains of b/k.

    @jax.jit
    def run(states, apps, ks):
        if chains:
            s, a, traj, infos = frontend.run_images_staggered(
                states, apps, imgs, ks, cfg, chains=chains)
            return s, traj, jnp.max(infos.search_r_needed)

        def one(st, app, k):
            def body(carry, inp):
                s, a = carry
                img, kk = inp
                s, a, info = frontend.step_image(s, a, img, kk, cfg)
                return (s, a), (s.x[:13], info.search_r_needed)
            (s, a), (traj, r_need) = jax.lax.scan(
                body, (st, app), (imgs, jax.random.split(k, FRAMES)))
            return s, traj, jnp.max(r_need)
        s, traj, r_need = jax.vmap(one)(states, apps, ks)
        return s, traj, jnp.max(r_need)

    keys = jax.random.split(jax.random.key(1), b)
    final, traj, r_need = run(st_b, app_b, keys)
    jax.block_until_ready(traj)
    # Best of 3 timing windows — same tunnel-stall rationale as main().
    n_rep = 3
    dt = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_rep):
            final, traj, r_need = run(
                st_b, app_b, jax.random.split(jax.random.key(2 + 3 * w + i),
                                              b))
        jax.block_until_ready((final, traj))  # tunnel flake guard, main()
        dt = min(dt, time.perf_counter() - t0)
    if not os.environ.get("EKF_ABLATE"):
        assert bool(jnp.all(jnp.isfinite(traj))), "non-finite trajectories"
        assert bool(jnp.all(jnp.isfinite(final.P))), "non-finite covariance"
        # Same honesty gate as main(): the image path must TRACK — this is
        # what catches a matcher-quality regression (e.g. a sampling form
        # whose TPU matmuls silently drop to bf16) that stays finite.
        err = float(jnp.mean(jnp.linalg.norm(
            traj[..., 0:3] - xs[None, :, 0:3], axis=-1)))
        print(f"pixels tracking err: {err:.4f}", file=sys.stderr)
        assert err < 0.5, f"trajectory error {err:.3f} — not tracking"
        a50, a95, amax = ensemble_ate(traj, xs)
        print(f"pixels ensemble ATE p50 {a50:.4f} p95 {a95:.4f} "
              f"max {amax:.4f}", file=sys.stderr)
        # Honesty gate for sizing the static search window (same protocol
        # as BENCH_M): when BENCH_R is explicitly set, the run is refused
        # if the χ² gate could ever reach beyond the window — within it,
        # the windowed argmax is bit-exact to an unbounded search.
        rn = float(r_need)
        print(f"pixels search radius needed: {rn:.2f} "
              f"(window {cfg.vision.search_radius})", file=sys.stderr)
        if os.environ.get("BENCH_R"):
            assert rn <= cfg.vision.search_radius, (
                f"χ² reach {rn:.2f} exceeds BENCH_R="
                f"{cfg.vision.search_radius} — the window truncates the "
                f"gate; raise BENCH_R")
    steps_per_sec = b * FRAMES * n_rep / dt
    print(json.dumps({
        "metric": "image_path_slam_steps_per_sec_per_chip_cap100",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s/chip",
        # The image path has its own declared target (BASELINE.md:
        # >=2,000 steps/s/chip = 30 fps for a 64-instance fleet) — the
        # 10k sim north star excludes the vision front-end.
        "vs_baseline": round(steps_per_sec / 2_000.0, 3),
    }))


def main_loop():
    """BENCH_MODE=loop: the end-to-end loop-closure fusion gate (BASELINE
    configs[4] — the retrieval->verify->constraint->filter link the
    reference leaves unconsumed, close_kitti_loops.py:141-154). Runs the
    pan-revisit experiment (examples/run_loop_closure.py, the r4
    protocol: REAL pixels front-end, 150 frames, 4 seeds, CPU) and
    ASSERTS the measured fusion win band (docs/CALC2_RUN.md r4: ATE p50
    0.1271 -> 0.0949, final-pose p50 0.2999 -> 0.0319 = 9.4x) so the
    flagship capability cannot silently regress. Gates at 2x margin,
    same protocol as the sim-mode accuracy gates.

    Env knobs: BENCH_LOOP_FRAMES/SEEDS, BENCH_LOOP_CKPT (+ implied w32
    @96x128 — a trained checkpoint), BENCH_LOOP_SEV (cross-season
    corruption), BENCH_LOOP_GATE=0 (report without asserting, for
    off-band configs)."""
    import subprocess
    import tempfile
    frames = int(os.environ.get("BENCH_LOOP_FRAMES", "150"))
    seeds = int(os.environ.get("BENCH_LOOP_SEEDS", "4"))
    # BENCH_LOOP_JSON: keep the harness summary as a committable artifact
    # (the gate run then doubles as the experiment's evidence file).
    out = os.environ.get("BENCH_LOOP_JSON") \
        or os.path.join(tempfile.mkdtemp(), "loop_bench.json")
    cmd = [sys.executable, "-u", "examples/run_loop_closure.py",
           "--frontend", "pixels", "--traj", "pan",
           "--frames", str(frames), "--ensemble", str(seeds),
           "--cpu", "--json", out]
    ckpt = os.environ.get("BENCH_LOOP_CKPT", "")
    if ckpt:
        cmd += ["--ckpt", ckpt, "--vss-width",
                os.environ.get("BENCH_LOOP_W", "32"),
                "--vss-hw", "96", "128"]
    sev = os.environ.get("BENCH_LOOP_SEV", "")
    if sev:
        cmd += ["--lc-severity", sev]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.abspath(__file__)))
    assert r.returncode == 0, "loop e2e harness failed"
    with open(out) as f:
        s = json.load(f)
    if os.environ.get("BENCH_LOOP_GATE", "1") != "0":
        assert s["n_loops_total"] > 0, "no loops declared — retrieval dead"
        assert s["ate_on_p50"] <= 1.05 * s["ate_off_p50"], (
            f"fusion HURT trajectory ATE: {s['ate_off_p50']:.4f} -> "
            f"{s['ate_on_p50']:.4f}")
        assert s["final_on_p50"] <= 0.5 * s["final_off_p50"], (
            f"final-pose rescue below the 2x gate (measured 9.4x, r4): "
            f"{s['final_off_p50']:.4f} -> {s['final_on_p50']:.4f}")
    improvement = s["final_off_p50"] / max(s["final_on_p50"], 1e-9)
    print(json.dumps({
        "metric": "loop_fusion_final_pose_improvement_pan",
        "value": round(improvement, 2),
        "unit": "x",
        # the gate band (2x) is the declared floor for this capability
        "vs_baseline": round(improvement / 2.0, 3),
    }))


def main():
    from ekf_slam_tpu.config import RansacConfig
    cap = int(os.environ.get("BENCH_CAP", "100"))
    # Default = the PRODUCTION FAST MODE (docs/BENCH.md r2): bf16-P
    # storage (all algebra still f32), 3-pass-bf16 f32-emulated matmul
    # precision, update capped at M=24 gathered observations — the
    # workload's true per-update max is 18 (gated in-run below: the
    # report REFUSES configs that ever drop an inlier past the cap,
    # mirroring the reference's stack-exactly-n-matches semantics).
    # Accuracy is also gated IN-RUN: the reported run must track ground
    # truth, not merely stay finite. The golden 1e-6-parity
    # configuration is BENCH_PSTORE=f32 EKF_COV_PRECISION=float32
    # BENCH_M=64.
    cfg = EngineConfig(
        # newton: Newton-Schulz SPD-inverse gain — pure MXU, tracks the
        # Cholesky gain to f32 accuracy (tests/test_compact_update.py)
        filter=FilterConfig(
            gain_solver=os.environ.get("BENCH_GAIN", "newton"),
            share_pht=os.environ.get("BENCH_SHARE_PHT", "0") == "1",
            # default off: the XLA path measures faster than the fused
            # mega-kernels (4277 vs 4232, docs/BENCH.md r2) and honors
            # the EKF_* attribution knobs.
            fused_step=os.environ.get("BENCH_FUSED", "off"),
            pallas_update=os.environ.get("BENCH_PALLAS", "off"),
            p_storage=os.environ.get("BENCH_PSTORE", "bf16")),
        map=MapConfig(capacity=cap, min_features_in_image=25,
                      max_new_per_step=10,
                      max_update_obs=int(os.environ.get("BENCH_M", "24"))),
        # NHYP=64 (the library default): the 16-frame sweep measured
        # 64/48/32/16 = 12637/12923/13279/diverged, but the 32 and 48
        # margins are HORIZON-LOCAL — at FRAMES=24 (M=32, so no inliers
        # dropped) NHYP=32 goes non-finite while 64 runs clean (12,074 at
        # the longer horizon). A default that diverges at 1.5x the bench
        # horizon is not a production config; the ~4.6% headline delta is
        # not worth it (docs/BENCH.md "NHYP horizon study").
        ransac=RansacConfig(
            num_hypotheses=int(os.environ.get("BENCH_NHYP", "64"))),
        sim=SimConfig(num_landmarks=128),
        dtype="float32")
    # max_new_per_step=10: the per-frame candidate batch; steady state adds
    # none, bootstrap reaches min_features within 3 frames (the reference's
    # initialize_features adds up to the deficit each frame too).

    scn, xs, obs = simulate(jax.random.key(0), cfg, FRAMES)
    st = engine.bootstrap(
        init_state(cfg), jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), BATCH)

    # BENCH_STAGGER=k: the software-pipelined k-chain driver
    # (engine.run_sequence_staggered) — bit-identical per-instance math
    # and key schedule (tests/test_engine.py), different instruction-level
    # parallelism (the r2o roofline probe, docs/BENCH.md).
    chains = _stagger_chains()

    @jax.jit
    def run(states, ks):
        if chains:
            final, traj, infos = engine.run_sequence_staggered(
                states, obs, ks, cfg, chains=chains)
        else:
            final, traj, infos = jax.vmap(
                lambda s, k: engine.run_sequence(s, obs, k, cfg))(states, ks)
        # max per-update observation counts across all instances+frames:
        # the compact update silently drops inliers past max_update_obs,
        # so an honest benchmark must prove the cap was never hit.
        max_obs = jnp.maximum(jnp.max(infos.n_li), jnp.max(infos.n_hi))
        return final, traj, max_obs

    # Warmup / compile (int() also warms the scalar-fetch path used to
    # close the timing loop below).
    final, traj, max_obs = run(st_b, keys)
    jax.block_until_ready(traj)
    _ = int(max_obs)

    # Best of 3 independent timing windows (3 reps each): the tunneled
    # backend shows transient multi-hundred-ms stalls that can shave >5%
    # off a single window (r3g's 11,813 vs the same config's 12,392/
    # 12,637 on other days); the fastest window is the honest steady-
    # state figure and each window still runs the full gated workload.
    n_rep = 3
    dt = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_rep):
            final, traj, max_obs = run(
                st_b, jax.random.split(jax.random.key(2 + 3 * w + i), BATCH))
        jax.block_until_ready(traj)
        # Force a real device-to-host fetch before reading the clock: on
        # the tunneled backend block_until_ready was once observed
        # returning without the work done (a 5.9M-steps/s phantom,
        # docs/BENCH.md). Fetch the SCALAR output — indexing traj would
        # lower+compile a new slice program through the tunnel and add
        # seconds to dt.
        _ = int(max_obs)
        dt = min(dt, time.perf_counter() - t0)

    # A benchmark of NaN-poisoned state is not a benchmark: refuse to
    # report if the filter diverged (guards against precision regressions —
    # TPU bf16-default matmuls NaNed the covariance before the f32
    # precision pinning in filter/ekf.py).
    # Attribution runs (EKF_ABLATE set) intentionally break the filter
    # math; the finiteness/accuracy gates only apply to real benchmarks.
    if not os.environ.get("EKF_ABLATE"):
        assert bool(jnp.all(jnp.isfinite(traj))), "non-finite trajectories"
        assert bool(jnp.all(jnp.isfinite(final.P))), "non-finite covariance"
        m_cap = cfg.map.max_update_obs
        assert m_cap <= 0 or int(max_obs) <= m_cap, (
            f"update cap hit: max per-update obs {int(max_obs)} > "
            f"max_update_obs {m_cap} — inliers were dropped; raise BENCH_M")
        # ...and a benchmark of a filter that lost the trajectory is not
        # one either: the fast mode (bf16-P storage + 3-pass f32-emulated
        # dots) must still TRACK — mean position error against the
        # simulation's ground truth bounded well below the scene scale.
        # Band derived from the r3 drift measurement at this exact
        # operating point (tools/measure_pstore_drift.py, docs/BENCH.md
        # r3): fast mode (bf16-P + tf32) measures 0.0988 mean position
        # error over 256 instances, parity mode (f32-P) 0.0883 — the
        # gate is 2x the fast-mode measurement; divergence is >1.
        err = float(jnp.mean(jnp.linalg.norm(
            traj[..., 0:3] - xs[None, :, 0:3], axis=-1)))
        print(f"sim tracking err: {err:.4f}", file=sys.stderr)
        assert err < 0.2, (
            f"trajectory error {err:.3f} — outside the measured "
            f"fast-mode band (0.099 ± margin, docs/BENCH.md r3)")
        # Ensemble ATE quantiles: unlike the mean, the p95/max expose
        # individual diverged instances that a 256-instance mean hides.
        # Measured at the headline operating point (runs/r3m): fast mode
        # (bf16-P) p50 0.0525 / p95 0.0759 / max 0.0799; parity (f32-P)
        # p50 0.0464 / p95 0.0530 / max 0.0749. Band = 2x the fast-mode
        # p95 (docs/BENCH.md r3 ATE table).
        a50, a95, amax = ensemble_ate(traj, xs)
        print(f"sim ensemble ATE p50 {a50:.4f} p95 {a95:.4f} "
              f"max {amax:.4f}", file=sys.stderr)
        assert a95 < 0.15, (
            f"ensemble ATE p95 {a95:.3f} — instances diverged beyond "
            f"the measured band (0.076 * 2, docs/BENCH.md r3 ATE table)")

    steps_per_sec = BATCH * FRAMES * n_rep / dt
    print(json.dumps({
        "metric": "batched_ekf_slam_steps_per_sec_per_chip_cap100",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    _mode = os.environ.get("BENCH_MODE", "sim")
    if _mode == "pixels":
        main_pixels()
    elif _mode == "loop":
        main_loop()
    else:
        main()
