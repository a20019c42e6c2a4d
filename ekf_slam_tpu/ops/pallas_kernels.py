"""Pallas TPU kernels for the EKF hot path.

`fused_update_tail`: the covariance half of the EKF measurement update
(update.m:13-24) — downdate P − K(PHᵀ)ᵀ, symmetrize, and the quaternion-
renormalization row/col transform — in ONE pass over P. The XLA version
takes ~4 full-P memory passes (downdate write, symmetrize read×2+write,
renorm row/col rewrites); this kernel reads each P tile twice ((i,j) and
(j,i) for the symmetrization) and writes once, with the K/PHt tiles feeding
the MXU. The update is HBM-bound at the engine's operating point
(B=512, D=613: a single full-P pass costs ~5 ms — tools/profile_linalg.py),
so pass-count is the metric that matters.

Tiling: (TILE x TILE) output tiles over a (D, D) covariance; edge blocks
are handled by Pallas' masked loads/stores. The quaternion block (rows/cols
3:7) lives entirely inside tile (0, 0)'s row/column stripe, so the renorm
transform is applied in-kernel via `pl.when(i == 0)` / `pl.when(j == 0)`.

Numerics are identical to the XLA path (tests/test_pallas_kernels.py checks
exact agreement in float32 on CPU interpret mode and on device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 128


def _kernel(Pij_ref, K_ref, PHt_ref, Jq_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # P enters the update symmetric (predict preserves symmetry; every
    # update re-symmetrizes), so sym(P − K·PHtᵀ) = P − 0.5(K·PHtᵀ + PHt·Kᵀ)
    # — no transposed-P read. K and PHt live whole in VMEM (row-padded to
    # the tile multiple by the host wrapper) and are sliced per tile.
    Ki = K_ref[pl.ds(i * TILE, TILE), :]
    Kj = K_ref[pl.ds(j * TILE, TILE), :]
    PHti = PHt_ref[pl.ds(i * TILE, TILE), :]
    PHtj = PHt_ref[pl.ds(j * TILE, TILE), :]
    # precision=HIGHEST: full-f32 multi-pass MXU dots — the covariance
    # downdate cannot run at the bf16 default (see ekf.f32_matmuls).
    out = Pij_ref[:] - 0.5 * (
        jnp.dot(Ki, PHtj.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(PHti, Kj.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))

    Jq = Jq_ref[0:8, 0:8]     # I3 ⊕ J4 ⊕ I1 stripe transform
    # One-hot extract/expand of the quaternion stripe (rows/cols 3:7 -> take
    # an 8-row stripe 0:8 and transform with I3 ⊕ Jq4 ⊕ I1 to stay on
    # sublane-aligned shapes).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
    EQ = (ridx == cidx).astype(out.dtype)     # (TILE, 8) rows 0..7 selector
    stripe_mask_r = (ridx[:, 0:1] < 8)        # (TILE, 1)

    @pl.when(i == 0)
    def _():
        stripe = jnp.dot(EQ.T, out, preferred_element_type=jnp.float32)
        stripe = jnp.dot(Jq, stripe, preferred_element_type=jnp.float32)
        expanded = jnp.dot(EQ, stripe, preferred_element_type=jnp.float32)
        out_ref[:] = jnp.where(stripe_mask_r, expanded, out)

    @pl.when(i != 0)
    def _():
        out_ref[:] = out

    @pl.when(j == 0)
    def _():
        cur = out_ref[:]
        stripe = jnp.dot(cur, EQ, preferred_element_type=jnp.float32)
        stripe = jnp.dot(stripe, Jq.T, preferred_element_type=jnp.float32)
        expanded = jnp.dot(stripe, EQ.T, preferred_element_type=jnp.float32)
        col_mask = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, TILE), 1) < 8
        out_ref[:] = jnp.where(col_mask, expanded, cur)


def _tail_single(P, K, PHt, Jq):
    D = P.shape[0]
    nt = pl.cdiv(D, TILE)
    M = K.shape[1]
    Dp = nt * TILE
    if Dp != D:
        # Row-pad K/PHt so in-kernel pl.ds slices stay exact (zero rows
        # contribute nothing; output edge tiles are store-masked anyway).
        K = jnp.concatenate([K, jnp.zeros((Dp - D, M), K.dtype)])
        PHt = jnp.concatenate([PHt, jnp.zeros((Dp - D, M), PHt.dtype)])
    grid = (nt, nt)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((D, D), P.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_INTERPRET[0],
    )(P, K, PHt, Jq)


# Test hook: force interpreter mode (CPU-executable) for equivalence tests.
_INTERPRET = [False]


def _pad_Jq(Jq4: jnp.ndarray) -> jnp.ndarray:
    """(4,4) quaternion-renorm Jacobian -> (8,128) I3 ⊕ J4 ⊕ I1 stripe
    transform, padded for sublane/lane tiling."""
    J8 = jnp.eye(8, dtype=Jq4.dtype).at[3:7, 3:7].set(Jq4)
    return jnp.zeros((8, 128), Jq4.dtype).at[:, 0:8].set(J8)


def fused_update_tail(P: jnp.ndarray, K: jnp.ndarray, PHt: jnp.ndarray,
                      Jq4: jnp.ndarray) -> jnp.ndarray:
    """P_new = T · sym(P − K·PHtᵀ) · Tᵀ with T = I ⊕ Jq4 on dims 3:7.

    PRECONDITION: P symmetric (it always is at the update's call sites —
    predict preserves symmetry and every update re-symmetrizes), which lets
    the kernel skip the transposed-P read:
    sym(P − K·PHtᵀ) = P − 0.5(K·PHtᵀ + PHt·Kᵀ).

    P: (..., D, D); K, PHt: (..., D, M); Jq4: (..., 4, 4). Batched via vmap.
    """
    if P.ndim == 2:
        return _tail_single(P, K, PHt, _pad_Jq(Jq4))
    return jax.vmap(fused_update_tail)(P, K, PHt, Jq4)


def _mm_kernel(A_ref, B_ref, out_ref, *, d2: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Zero the ragged contraction columns of the edge A block: pad contents
    # are unspecified (NaN in interpret mode) and 0*NaN = NaN.
    col = k * TILE + jax.lax.broadcasted_iota(jnp.int32, A_ref.shape, 1)
    A = jnp.where(col < d2, A_ref[:], 0.0)
    Bk = B_ref[pl.ds(k * TILE, TILE), :]
    out_ref[:] += jnp.dot(A, Bk,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _mm_single(A, B):
    D1, D2 = A.shape
    M = B.shape[1]
    nt_i = pl.cdiv(D1, TILE)
    nt_k = pl.cdiv(D2, TILE)
    Dp = nt_k * TILE
    if Dp != D2:
        # Zero row-padding of B kills the garbage columns of edge A blocks
        # in the contraction.
        B = jnp.concatenate([B, jnp.zeros((Dp - D2, M), B.dtype)])
    import functools as _ft
    return pl.pallas_call(
        _ft.partial(_mm_kernel, d2=D2),
        out_shape=jax.ShapeDtypeStruct((D1, M), A.dtype),
        grid=(nt_i, nt_k),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, k: (i, k)),
            pl.BlockSpec((Dp, M), lambda i, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, M), lambda i, k: (i, 0)),
        interpret=_INTERPRET[0],
    )(A, B)


def f32_matmul_big(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Full-f32-accurate A @ B for a large A (e.g. the covariance) and a
    narrow B, reading A from HBM ONCE: the f32 multi-pass happens on the
    MXU from VMEM. XLA's equivalent (precision=HIGHEST) re-reads the
    operands per pass — 3x the HBM traffic on the P-sized operand, which is
    what the EKF update is bound by. Batched via vmap."""
    if A.ndim == 2:
        return _mm_single(A, B)
    return jax.vmap(f32_matmul_big)(A, B)


def pallas_supported() -> bool:
    """True when the default backend lowers Pallas TPU kernels."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")
