"""TPU numerics check: does the engine stay finite on-device, and does
matmul precision fix it? Runs the bench config for a few frames and
reports finiteness + max covariance asymmetry per precision mode."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import (EngineConfig, FilterConfig,
                                 MapConfig, SimConfig)
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate


def run(precision, solver, B=64, T=16):
    cfg = EngineConfig(
        filter=FilterConfig(gain_solver=solver),
        map=MapConfig(capacity=100, min_features_in_image=25,
                      max_new_per_step=10),
        sim=SimConfig(num_landmarks=128))
    with jax.default_matmul_precision(precision):
        scn, xs, obs = simulate(jax.random.key(0), cfg, T)
        st = engine.bootstrap(init_state(cfg),
                              jax.tree.map(lambda a: a[0], obs), cfg)
        stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)

        @jax.jit
        def go(states, ks):
            final, traj, infos = jax.vmap(
                lambda s, k: engine.run_sequence(s, obs, k, cfg))(states, ks)
            return final, traj, infos

        final, traj, infos = go(stb, jax.random.split(jax.random.key(1), B))
        jax.block_until_ready(traj)
    finite = bool(jnp.all(jnp.isfinite(traj)))
    asym = float(jnp.max(jnp.abs(final.P - jnp.swapaxes(final.P, 1, 2))))
    err = float(jnp.mean(jnp.linalg.norm(
        traj[:, -1, 0:3] - xs[-1][0:3], axis=-1)))
    nic = int(jnp.mean(infos.n_ic[:, -1]))
    print(f"precision={precision:10s} solver={solver:8s} finite={finite} "
          f"P-asym={asym:.2e} pos_err={err:.4f} n_ic={nic}")


def device_vs_cpu(B=8, T=10):
    """Same f32 engine run on the accelerator vs host CPU: reports the max
    trajectory deviation (quantifies on-device matmul accuracy end-to-end).
    """
    cfg = EngineConfig(
        map=MapConfig(capacity=100, min_features_in_image=25,
                      max_new_per_step=10),
        sim=SimConfig(num_landmarks=128))
    # pallas auto-detect keys off the global default backend, so the CPU
    # replica must force the XLA update path (and the unfused step)
    # explicitly.
    cfg_cpu = EngineConfig(
        filter=FilterConfig(pallas_update="off", fused_step="off"),
        map=MapConfig(capacity=100, min_features_in_image=25,
                      max_new_per_step=10),
        sim=SimConfig(num_landmarks=128))
    scn, xs, obs = simulate(jax.random.key(0), cfg, T)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), B)

    def make_go(c):
        def go(states, o, ks):
            _, traj, _ = jax.vmap(
                lambda s, k: engine.run_sequence(s, o, k, c))(states, ks)
            return traj
        return go

    traj_dev = jax.jit(make_go(cfg))(stb, obs, keys)
    jax.block_until_ready(traj_dev)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        args_cpu = jax.device_put((stb, obs, keys), cpu)
        traj_cpu = jax.jit(make_go(cfg_cpu))(*args_cpu)
    dev = jnp.max(jnp.abs(jnp.asarray(traj_dev) - jnp.asarray(traj_cpu)))
    print(f"device-vs-cpu max trajectory deviation over {T} frames: "
          f"{float(dev):.2e}")


if __name__ == "__main__":
    for precision in ("default", "float32"):
        for solver in ("cholesky", "newton"):
            run(precision, solver)
    device_vs_cpu()
