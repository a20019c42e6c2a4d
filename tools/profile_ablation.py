"""Ablation timing of the composed SLAM step: disable stages one at a time
inside the REAL fused program (stage-in-isolation timing misses fusion and
memory-traffic effects)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import EngineConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import association, ekf, engine, mapman, measurement, ransac
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

B = int(os.environ.get("B", "512"))
CAP = 100


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms  ({B/dt:9.0f} inst/s)")


def make_step(cfg, obs1, stages):
    """stages: set of enabled stage names."""

    def step(state, key):
        f = cfg.filter
        if "mapman" in stages:
            state = mapman.manage(state, cfg)
        x_prior, P_prior = ekf.predict(state.x, state.P, f) \
            if "predict" in stages else (state.x, state.P)
        z, z_valid = engine.gather_measurements(state, obs1)
        h, visible, H_xv, H_y = engine._linearize(
            x_prior, P_prior, state, cfg)[:4]
        S = measurement.innovation_covariances(P_prior, H_xv, H_y, f.sigma_z)
        ic = association.individually_compatible(
            z, z_valid, h, visible, S, cfg)
        if "ransac" in stages:
            vm = visible.astype(H_xv.dtype)[:, None, None]
            li, support = ransac.run(x_prior, P_prior, z, h, H_xv * vm,
                                     H_y * vm, S, ic,
                                     state.cartesian, key, cfg)
        else:
            li = ic
        if "li_update" in stages:
            x_post, P_post = engine._masked_update(
                x_prior, P_prior, H_xv, H_y, z, h, li, cfg)
        else:
            x_post, P_post = x_prior, P_prior
        if "hi_update" in stages:
            h2, vis2, H_xv2, H_y2 = engine._linearize(
                x_post, P_post, state, cfg)[:4]
            S_noR = measurement.innovation_covariances(
                P_post, H_xv2, H_y2, 0.0)
            hi = association.rescue_high_innovation(
                z, h2, S_noR, ic & vis2, li, cfg)
            x_post, P_post = engine._masked_update(
                x_post, P_post, H_xv2, H_y2, z, h2, hi, cfg)
        state = state.replace(x=x_post, P=P_post)
        state = mapman.update_counters(state, visible, ic)
        if "init" in stages:
            state = engine.initialize_features(state, obs1, jnp.sum(ic), cfg)
        return state

    return step


def main():
    from ekf_slam_tpu.config import FilterConfig
    cfg = EngineConfig(
        filter=FilterConfig(gain_solver=os.environ.get("GAIN", "newton")),
        map=MapConfig(capacity=CAP, min_features_in_image=25,
                      max_new_per_step=int(os.environ.get("K", "10"))),
        sim=SimConfig(num_landmarks=128))
    scn, xs, obs = simulate(jax.random.key(0), cfg, 2)
    obs0 = jax.tree.map(lambda a: a[0], obs)
    obs1 = jax.tree.map(lambda a: a[1], obs)
    st = engine.bootstrap(init_state(cfg), obs0, cfg)
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), B)

    ALL = {"mapman", "predict", "ransac", "li_update", "hi_update", "init"}
    variants = [("ALL", ALL)] + [
        (f"-{s}", ALL - {s})
        for s in ["mapman", "predict", "ransac", "li_update", "hi_update",
                  "init"]]
    for name, stages in variants:
        fn = jax.jit(jax.vmap(make_step(cfg, obs1, stages)))
        timeit(name, fn, stb, keys)


if __name__ == "__main__":
    main()
