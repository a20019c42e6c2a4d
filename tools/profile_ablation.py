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


def timeit(name, step_fn, state0, keys, reps=8):
    """CHAINED timing: the step is scanned reps times feeding the state
    through — repeated same-arg dispatch is elided by the tunnel backend
    (block_until_ready returns without executing), so only chained
    execution measures real per-step cost."""
    @jax.jit
    def run(st):
        def body(s, k):
            return step_fn(s, k), ()
        out, _ = jax.lax.scan(body, st, keys)
        return out

    out = run(state0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jax.tree.map(
        lambda a: a * (1 + 1e-6) if a.dtype.kind == "f" else a, out))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.2f} ms  ({B/dt:9.0f} inst/s)", flush=True)


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

    REPS = int(os.environ.get("REPS", "8"))
    kseq = jax.random.split(jax.random.key(2), REPS)
    ALL = {"mapman", "predict", "ransac", "li_update", "hi_update", "init"}
    variants = [("ALL", ALL)] + [
        (f"-{s}", ALL - {s})
        for s in ["mapman", "predict", "ransac", "li_update", "hi_update",
                  "init"]]
    if os.environ.get("FUSED", "0") == "1":
        import dataclasses
        from ekf_slam_tpu.config import FilterConfig as _FC
        cfgf = dataclasses.replace(
            cfg, filter=dataclasses.replace(cfg.filter, fused_step="on"))
        fstep = jax.vmap(lambda s, k: engine.step_fused(s, obs1, k, cfgf)[0])
        timeit("FUSED step", lambda st, k: fstep(
            st, jax.random.split(k, B)), stb, kseq)
        return
    for name, stages in variants:
        sfn = make_step(cfg, obs1, stages)
        fn = jax.vmap(sfn)
        timeit(name, lambda st, k, fn=fn: fn(
            st, jax.random.split(k, B)), stb, kseq)


if __name__ == "__main__":
    main()
