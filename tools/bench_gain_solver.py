import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from ekf_slam_tpu.config import EngineConfig, FilterConfig, MapConfig, SimConfig
from ekf_slam_tpu.filter import engine
from ekf_slam_tpu.filter.state import init_state
from ekf_slam_tpu.sim import simulate

for solver in ("cholesky", "newton"):
    cfg = EngineConfig(
        filter=FilterConfig(gain_solver=solver),
        map=MapConfig(capacity=100, min_features_in_image=25, max_new_per_step=10),
        sim=SimConfig(num_landmarks=128))
    B, F = 512, 8
    scn, xs, obs = simulate(jax.random.key(0), cfg, F)
    st = engine.bootstrap(init_state(cfg), jax.tree.map(lambda a: a[0], obs), cfg)
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
    run = jax.jit(lambda s, k: jax.vmap(lambda si, ki: engine.run_sequence(si, obs, ki, cfg))(s, k)[1])
    out = run(stb, jax.random.split(jax.random.key(1), B)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(stb, jax.random.split(jax.random.key(2+i), B))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(solver, round(B*F*3/dt, 1), "steps/s")
