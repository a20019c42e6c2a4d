"""Dump the bench step's optimized HLO for analyze_hlo.py.

Builds EXACTLY the jitted program bench.py times (same env knobs:
BENCH_BATCH/CAP/M/NHYP/GAIN/PSTORE, EKF_*), lowers + compiles it for
the active backend, and writes compiled.as_text() to the output path.

  python tools/dump_hlo.py [/tmp/bench_step.hlo]

Compiling through the axon tunnel takes minutes; run detached.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BENCH_MODE", "sim") != "pixels":
    os.environ.setdefault("EKF_COV_PRECISION", "tensorfloat32")

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import (EngineConfig, FilterConfig, MapConfig,
                                 RansacConfig, SimConfig)
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

BATCH = int(os.environ.get("BENCH_BATCH", "512"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "8"))


def main(out_path):
    cap = int(os.environ.get("BENCH_CAP", "100"))
    cfg = EngineConfig(
        filter=FilterConfig(
            gain_solver=os.environ.get("BENCH_GAIN", "newton"),
            share_pht=os.environ.get("BENCH_SHARE_PHT", "0") == "1",
            fused_step=os.environ.get("BENCH_FUSED", "off"),
            pallas_update=os.environ.get("BENCH_PALLAS", "off"),
            p_storage=os.environ.get("BENCH_PSTORE", "bf16")),
        map=MapConfig(capacity=cap, min_features_in_image=25,
                      max_new_per_step=10,
                      max_update_obs=int(os.environ.get("BENCH_M", "24"))),
        ransac=RansacConfig(
            num_hypotheses=int(os.environ.get("BENCH_NHYP", "64"))),
        sim=SimConfig(num_landmarks=128),
        dtype="float32")

    scn, xs, obs = simulate(jax.random.key(0), cfg, FRAMES)
    st = engine.bootstrap(
        init_state(cfg), jax.tree.map(lambda a: a[0], obs), cfg)
    st_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), BATCH)

    @jax.jit
    def run(states, ks):
        final, traj, infos = jax.vmap(
            lambda s, k: engine.run_sequence(s, obs, k, cfg))(states, ks)
        return final, traj

    txt = run.lower(st_b, keys).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {out_path}")


def main_pixels(out_path):
    """BENCH_MODE=pixels analog: the exact step_image program the pixels
    bench times (vision front-end + filter) at BENCH_PIXB instances."""
    from ekf_slam_tpu.config import VisionConfig
    from ekf_slam_tpu.vision import frontend

    b = int(os.environ.get("BENCH_PIXB", "64"))
    cap = int(os.environ.get("BENCH_CAP", "100"))
    cfg = EngineConfig(
        filter=FilterConfig(gain_solver=os.environ.get("BENCH_GAIN",
                                                       "newton")),
        map=MapConfig(capacity=cap, min_features_in_image=25,
                      max_new_per_step=10, max_update_obs=64),
        vision=VisionConfig(matcher=os.environ.get("BENCH_MATCHER", "ncc")),
        sim=SimConfig(num_landmarks=128),
        dtype="float32")
    scn, xs, _ = simulate(jax.random.key(0), cfg, FRAMES)
    render = jax.jit(frontend.render_scene_image, static_argnames="cfg")
    imgs = jnp.stack([render(scn, xs[t], cfg) for t in range(FRAMES)])
    st0 = init_state(cfg)
    app0 = frontend.init_appearance(cfg)
    st_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), st0)
    app_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), app0)

    @jax.jit
    def run(states, apps, ks):
        def one(st, app, k):
            def body(carry, inp):
                s, a = carry
                img, kk = inp
                s, a, info = frontend.step_image(s, a, img, kk, cfg)
                return (s, a), s.x[:13]
            (s, a), traj = jax.lax.scan(
                body, (st, app), (imgs, jax.random.split(k, FRAMES)))
            return s, traj
        return jax.vmap(one)(states, apps, ks)

    keys = jax.random.split(jax.random.key(1), b)
    txt = run.lower(st_b, app_b, keys).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {out_path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_step.hlo"
    if os.environ.get("BENCH_MODE", "sim") == "pixels":
        main_pixels(out)
    else:
        main(out)
