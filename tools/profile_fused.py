"""Micro-profile of the round-2 mega-kernels vs the XLA compositions they
replace, at the bench operating point (B=512, CAP=100, D=613, M=64).

IMPORTANT methodology note (axon tunnel): repeated dispatch of the SAME
jitted fn on the SAME args is elided/cached — block_until_ready returns in
microseconds regardless of the op. Every measurement here therefore CHAINS
the op inside a lax.scan (P output feeds P input), which forces real
sequential execution; reported time = scan_time / iters."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ekf_slam_tpu.filter import ekf
from ekf_slam_tpu.ops import pallas_kernels as pk
from ekf_slam_tpu.ops import quaternion as quat

B = int(os.environ.get("B", "512"))
CAP = 100
D = 13 + 6 * CAP
M = 64
KADD = 10
R2 = 2 * CAP
ITERS = int(os.environ.get("ITERS", "10"))


def timeit_chained(name, step_fn, P0, *ops):
    """step_fn: (P, *ops) -> P (same shape/dtype). Scan ITERS times.
    Operands are threaded as jit ARGUMENTS (closure capture would bake
    them into the HLO as constants — the tunnel rejects >100MB compile
    payloads with HTTP 413)."""
    @jax.jit
    def run(P, *ops):
        def body(p, _):
            return step_fn(p, *ops), ()
        out, _ = jax.lax.scan(body, P, None, length=ITERS)
        return out

    out = run(P0, *ops)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(out * 0.999, *ops)   # different input, same program
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:38s} {dt*1e3:9.2f} ms", flush=True)


def main():
    key = jax.random.key(0)
    A = jax.random.normal(key, (B, D, D), jnp.float32) * 0.01
    P0 = jnp.einsum("bij,bkj->bik", A, A) + jnp.eye(D) * 0.1
    keep = jnp.ones((B, D), jnp.float32)
    E6 = jnp.zeros((B, 6, D), jnp.float32)
    U6 = jnp.zeros((B, 6, D), jnp.float32)
    C66 = jnp.zeros((B, 6, 6), jnp.float32)
    F13 = jnp.tile(jnp.eye(13, dtype=jnp.float32)[None], (B, 1, 1))
    Q13 = jnp.tile((jnp.eye(13, dtype=jnp.float32) * 1e-4)[None], (B, 1, 1))
    Ht = jax.random.normal(jax.random.key(1), (B, D, R2), jnp.float32) * 0.01
    K = jax.random.normal(jax.random.key(2), (B, D, 2 * M),
                          jnp.float32) * 0.001
    PHt = jax.random.normal(jax.random.key(3), (B, D, 2 * M),
                            jnp.float32) * 0.001
    q = jax.random.normal(jax.random.key(4), (B, 4), jnp.float32)
    Jq = jax.vmap(quat.norm_jac)(q)
    H = jnp.swapaxes(Ht, 1, 2)[:, :2 * M, :]

    rk = 6 * KADD
    EN = jnp.zeros((B, rk, D), jnp.float32)
    UN = jnp.zeros((B, rk, D), jnp.float32)
    CN = jnp.zeros((B, rk, rk), jnp.float32)


    # --- kernels (chained on P) ---
    timeit_chained(
        "K1 fused_manage_predict_pht",
        lambda P, keep, E6, U6, C66, F13, Q13, Ht: pk.fused_manage_predict_pht(
            P, keep, E6, U6, C66, F13, Q13, Ht)[0],
        P0, keep, E6, U6, C66, F13, Q13, Ht)
    timeit_chained(
        "K2 fused_update_tail_pht",
        lambda P, K, PHt, Jq, Ht: pk.fused_update_tail_pht(P, K, PHt, Jq, Ht)[0],
        P0, K, PHt, Jq, Ht)
    timeit_chained(
        "K3 fused_update_tail_add",
        lambda P, K, PHt, Jq, keep, EN, UN, CN: pk.fused_update_tail_add(
            P, K, PHt, Jq, keep, EN, UN, CN),
        P0, K, PHt, Jq, keep, EN, UN, CN)
    timeit_chained(
        "tail (round-1 kernel)",
        lambda P, K, PHt, Jq: pk.fused_update_tail(P, K, PHt, Jq),
        P0, K, PHt, Jq)

    # --- XLA compositions they replace ---
    @ekf.f32_matmuls
    def xla_manage_predict(P, keep, E6, U6, C66, F13, Q13):
        contrib = jnp.einsum("bri,brj->bij", E6, U6)
        Pm = (P * (keep[:, :, None] * keep[:, None, :])
              + contrib + jnp.swapaxes(contrib, 1, 2)
              + jnp.einsum("bri,brs,bsj->bij", E6, C66, E6))
        top = jnp.einsum("bij,bjk->bik", F13, Pm[:, :13, :])
        tl = jnp.einsum("bik,bjk->bij", top[:, :, :13], F13) + Q13
        top = jnp.concatenate([tl, top[:, :, 13:]], axis=2)
        bottom = jnp.concatenate(
            [jnp.swapaxes(top[:, :, 13:], 1, 2), Pm[:, 13:, 13:]], axis=2)
        return jnp.concatenate([top, bottom], axis=1)
    timeit_chained("XLA manage+predict", xla_manage_predict,
                   P0, keep, E6, U6, C66, F13, Q13)

    @ekf.f32_matmuls
    def xla_tail(P, K, PHt, Jq):
        Pn = P - jnp.einsum("bij,bkj->bik", K, PHt)
        Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 1, 2))
        rows = jnp.einsum("bij,bjk->bik", Jq, Pn[:, 3:7, :])
        Pn = jnp.concatenate([Pn[:, :3, :], rows, Pn[:, 7:, :]], axis=1)
        cols = jnp.einsum("bik,bjk->bij", Pn[:, :, 3:7], Jq)
        return jnp.concatenate([Pn[:, :, :3], cols, Pn[:, :, 7:]], axis=2)
    timeit_chained("XLA tail (downdate+renorm)", xla_tail, P0, K, PHt, Jq)

    @ekf.f32_matmuls
    def xla_pht_dense(P, H):
        pht = jnp.einsum("bij,bkj->bik", P, H)      # (B, D, 2M)
        return P + 1e-12 * pht[:, :, 0:1]           # consume, keep shape
    timeit_chained("XLA dense P@Ht 2M + passthrough", xla_pht_dense, P0, H)

    @ekf.f32_matmuls
    def xla_addfeat(P, keep, EN, UN, CN):
        contrib = jnp.einsum("bri,brj->bij", EN, UN)
        return (P * (keep[:, :, None] * keep[:, None, :])
                + contrib + jnp.swapaxes(contrib, 1, 2)
                + jnp.einsum("bri,brs,bsj->bij", EN, CN, EN))
    timeit_chained("XLA addfeat lowrank", xla_addfeat, P0, keep, EN, UN, CN)

    timeit_chained("P identity copy (P*1.0001 floor)",
                   lambda P: P * 1.0001, P0)


if __name__ == "__main__":
    main()
