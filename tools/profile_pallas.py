"""TPU timing: XLA update vs Pallas fused-tail update, and full step."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import EngineConfig, FilterConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine, measurement
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

B = 512
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


def main():
    for mode in ("off", "on"):
        cfg = EngineConfig(
            filter=FilterConfig(pallas_update=mode),
            map=MapConfig(capacity=CAP, min_features_in_image=25,
                          max_new_per_step=25),
            sim=SimConfig(num_landmarks=128))
        scn, xs, obs = simulate(jax.random.key(0), cfg, 2)
        obs0 = jax.tree.map(lambda a: a[0], obs)
        obs1 = jax.tree.map(lambda a: a[1], obs)
        st = engine.bootstrap(init_state(cfg), obs0, cfg)
        stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
        keys = jax.random.split(jax.random.key(1), B)

        z, zv = jax.vmap(engine.gather_measurements)(stb, jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), obs1))
        upd = jax.jit(jax.vmap(lambda s, z_, m_: engine._masked_update(
            s.x, s.P,
            *(lambda t: (t[2], t[3], z_, t[0]))(
                measurement.predict_and_linearize(s.x, s.P, s, cfg)),
            m_, cfg)))
        timeit(f"update pallas={mode}", upd, stb, z, zv)

        full = jax.jit(jax.vmap(
            lambda s, k: engine.step(s, obs1, k, cfg)[0]))
        timeit(f"FULL step pallas={mode}", full, stb, keys)


if __name__ == "__main__":
    main()
