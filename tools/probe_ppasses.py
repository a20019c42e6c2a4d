"""Direct probe of the full-P pass cost model at the bench operating point.

Two sweeps over k = number of DISTINCT sequential full-P transforms per
step (each: one P read + one P write + a rank-16 matmul to defeat
elementwise fusion/CSE):

  chain : P_i feeds P_{i+1}, intermediates die -> footprint ~2 buffers
          regardless of k. Pure bandwidth scaling: ms should be linear
          in k.
  live  : same chain but the step output is sum_i P_i, keeping ALL
          intermediates live -> footprint grows with k. If ms grows
          SUPERLINEARLY here but not in `chain`, the SLAM step's cost
          cliff (tools/profile_ablation.py round 2: removing any one of
          six stages saves ~125-145 ms of a 234 ms step) is working-set
          pressure, not bandwidth.

Chained-scan timing like profile_ablation (tunnel elides repeated
same-arg dispatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", "512"))
D = int(os.environ.get("D", "613"))
REPS = int(os.environ.get("REPS", "8"))


def timeit(name, step_fn, P0, Ws):
    @jax.jit
    def run(P, Ws):
        def body(p, _):
            return step_fn(p, Ws), ()
        out, _ = jax.lax.scan(body, P, None, length=REPS)
        return out

    out = run(P0, Ws)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(out * 0.9995, Ws)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1e3:9.2f} ms", flush=True)


def main():
    key = jax.random.key(0)
    P0 = jnp.eye(D, dtype=jnp.float32)[None] * 0.1
    P0 = jnp.broadcast_to(P0, (B, D, D)) + 0.0
    for k in (1, 2, 4, 6):
        Ws = jax.random.normal(key, (k, D, 16), jnp.float32) * 0.01

        def chain(P, Ws, k=k):
            for i in range(k):
                W = Ws[i]
                P = 0.999 * P + jnp.einsum(
                    "bdr,er->bde", jnp.einsum("bde,er->bdr", P, W), W)
            return P

        def live(P, Ws, k=k):
            acc = None
            for i in range(k):
                W = Ws[i]
                P = 0.999 * P + jnp.einsum(
                    "bdr,er->bde", jnp.einsum("bde,er->bdr", P, W), W)
                acc = P if acc is None else acc + P
            return acc / k

        timeit(f"chain k={k}", chain, P0, Ws)
        timeit(f"live  k={k}", live, P0, Ws)


if __name__ == "__main__":
    main()
