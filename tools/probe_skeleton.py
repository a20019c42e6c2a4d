"""Definitive skeleton probe: the EKF_ABLATE bench series showed the FULL
pipeline (4232 steps/s at B=512) equals the everything-ablated skeleton
(4241) — all compute is hidden; something structural costs ~120 ms/frame.

Times (bench.py methodology: one jit per variant, warmup, 3 reps, block):

  carry      : scan body returns the state unchanged     -> loop skeleton
  carry+P    : body multiplies P by 1.0001               -> one full-P pass
  carry+lin  : body runs _linearize + gates only          -> small-op chain
  carry+z    : body runs gather_measurements only
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import EngineConfig, FilterConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import association, engine, measurement
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

B = int(os.environ.get("B", "512"))
FRAMES = 8


def bench(name, body):
    cfg = EngineConfig(
        map=MapConfig(capacity=100, min_features_in_image=25,
                      max_new_per_step=10, max_update_obs=64),
        sim=SimConfig(num_landmarks=128), dtype="float32")
    scn, xs, obs = simulate(jax.random.key(0), cfg, FRAMES)
    st = engine.bootstrap(init_state(cfg),
                          jax.tree.map(lambda a: a[0], obs), cfg)
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    keys = jax.random.split(jax.random.key(1), B)

    @jax.jit
    def run(states, ks):
        def one(s0, k):
            def step(s, inp):
                o, kk = inp
                s = body(s, o, kk, cfg)
                return s, s.x[:13]
            fin, traj = jax.lax.scan(
                step, s0, (obs, jax.random.split(k, FRAMES)))
            return traj
        return jax.vmap(one)(states, ks)

    out = run(stb, keys)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(stb, jax.random.split(jax.random.key(2 + i), B))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    sps = B * FRAMES * 3 / dt
    print(f"{name:12s} {sps:10.1f} steps/s  ({dt/3/FRAMES*1e3:7.2f} ms/frame)",
          flush=True)


def _extra_variants():
    """Extend VARIANTS: carry+S (innovation_covariances incl. the
    _slot_diag_blocks advanced-index gather on P), carry+rescue."""
    def carry_s(s, o, k, cfg):
        h, visible, H_xv, H_y = engine._linearize(s.x, s.P, s, cfg)[:4]
        S = measurement.innovation_covariances(s.P, H_xv, H_y, 1.0)
        return s.replace(x=s.x + 1e-12 * jnp.sum(S))

    def carry_diag(s, o, k, cfg):
        blocks = measurement._slot_diag_blocks(s.P, s.capacity)
        return s.replace(x=s.x + 1e-12 * jnp.sum(blocks))

    return {"carry+S": carry_s, "carry+diag": carry_diag}


def main():
    which = os.environ.get("VARIANTS", "carry,carry+P,carry+lin,carry+z")

    def carry(s, o, k, cfg):
        return s.replace(x=s.x + 1e-12)   # defeat loop-invariant hoisting

    def carry_p(s, o, k, cfg):
        return s.replace(P=s.P * 1.0001, x=s.x + 1e-12)

    def carry_lin(s, o, k, cfg):
        h, visible, H_xv, H_y = engine._linearize(s.x, s.P, s, cfg)[:4]
        S = jnp.broadcast_to(jnp.eye(2, dtype=s.x.dtype) * 4.0,
                             (s.capacity, 2, 2))
        z, z_valid = engine.gather_measurements(s, o)
        ic = association.individually_compatible(z, z_valid, h, visible, S,
                                                 cfg)
        return s.replace(x=s.x + 1e-12 * jnp.sum(ic))

    def carry_z(s, o, k, cfg):
        z, z_valid = engine.gather_measurements(s, o)
        return s.replace(x=s.x + 1e-12 * jnp.sum(z * z_valid[:, None]))

    table = {"carry": carry, "carry+P": carry_p, "carry+lin": carry_lin,
             "carry+z": carry_z}
    table.update(_extra_variants())
    for name in which.split(","):
        bench(name, table[name])


if __name__ == "__main__":
    main()