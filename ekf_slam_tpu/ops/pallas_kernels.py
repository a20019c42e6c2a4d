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
    # bf16-stored P upcasts on read and rounds on store (the fast mode's
    # storage contract); all arithmetic is f32.
    Ki = K_ref[pl.ds(i * TILE, TILE), :]
    Kj = K_ref[pl.ds(j * TILE, TILE), :]
    PHti = PHt_ref[pl.ds(i * TILE, TILE), :]
    PHtj = PHt_ref[pl.ds(j * TILE, TILE), :]
    # f32-stored P: HIGHEST (full-f32 multi-pass MXU dots — the parity
    # path's downdate cannot run at the bf16 default, see
    # ekf.f32_matmuls). bf16-stored P: DEFAULT — the result is rounded
    # to bf16 on store anyway, so single-pass bf16 dots introduce error
    # of the same order as the storage rounding at 1/6 the MXU passes
    # (the HIGHEST variant measured SLOWER than the XLA stacked tail,
    # docs/BENCH.md round 2).
    prec = (jax.lax.Precision.DEFAULT if out_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    out = Pij_ref[:].astype(jnp.float32) - 0.5 * (
        jnp.dot(Ki, PHtj.T, preferred_element_type=jnp.float32,
                precision=prec)
        + jnp.dot(PHti, Kj.T, preferred_element_type=jnp.float32,
                  precision=prec))

    Jq = Jq_ref[0:8, 0:8]     # I3 ⊕ J4 ⊕ I1 stripe transform
    # One-hot extract/expand of the quaternion stripe (rows/cols 3:7 -> take
    # an 8-row stripe 0:8 and transform with I3 ⊕ Jq4 ⊕ I1 to stay on
    # sublane-aligned shapes).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
    EQ = (ridx == cidx).astype(out.dtype)     # (TILE, 8) rows 0..7 selector
    stripe_mask_r = (ridx[:, 0:1] < 8)        # (TILE, 1)

    st = out_ref.dtype

    @pl.when(i == 0)
    def _():
        stripe = jnp.dot(EQ.T, out, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        stripe = jnp.dot(Jq, stripe, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        expanded = jnp.dot(EQ, stripe, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = jnp.where(stripe_mask_r, expanded, out).astype(st)

    @pl.when(i != 0)
    def _():
        out_ref[:] = out.astype(st)

    @pl.when(j == 0)
    def _():
        cur = out_ref[:].astype(jnp.float32)
        stripe = jnp.dot(cur, EQ, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        stripe = jnp.dot(stripe, Jq.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        expanded = jnp.dot(stripe, EQ.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        col_mask = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, TILE), 1) < 8
        out_ref[:] = jnp.where(col_mask, expanded, cur).astype(st)


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


# ---------------------------------------------------------------------------
# Round-2 mega-kernels: one P read + one P write per pipeline phase.
#
# The round-1 step paid ~15 full-P memory passes (manage, predict, the two
# updates' P@Hᵀ products and tails, feature-init) at ~5 ms each. These
# kernels collapse each phase to a single streamed pass:
#   K1 fused_manage_predict_pht — map management (delete mask + one
#      inverse-depth→cartesian conversion as a rank-6 update), the EKF time
#      update (block-sparse F on the 13-dim camera stripe + Q), AND the
#      P·Hᵀ gain columns for the *next* stage, all while P streams through
#      VMEM once (map_management.m + predict_state_and_covariance.m:26-27 +
#      search_IC_matches.m:8 in one pass).
#   K2 fused_update_tail_pht — the LI-update covariance tail (downdate +
#      symmetrize + quaternion renorm, update.m:13-24) AND the posterior
#      P·Hᵀ for the HI rescue/update in the same pass.
#   K3 fused_update_tail_add — the HI-update tail AND the batched
#      feature-initialization write-back (new rows / cross blocks,
#      add_a_feature_covariance_inverse_depth.m:61-64) as a rank-6K additive
#      update in the same pass.
# ---------------------------------------------------------------------------


def _dot(a, b):
    """Small-operand dot (stripe transforms, rank-6 terms): full-accuracy
    f32 (HIGHEST); negligible MXU time at these shapes."""
    return jnp.dot(a, b, preferred_element_type=a.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _dot3(a, b):
    """Heavy-operand dot at the XLA engine's precision: 3-pass bf16
    emulation of f32 (== jax.default_matmul_precision("float32"), what
    ekf.f32_matmuls pins everywhere). Mosaic does not lower
    Precision.HIGH, so the split is done by hand: a·b ≈ a_hi·b_hi +
    a_hi·b_lo + a_lo·b_hi with f32 accumulation. HIGHEST (6-pass) costs
    2x the MXU time of this for accuracy the rest of the pipeline does
    not have. Non-f32 dtypes (the float64 interpret-mode tests) fall back
    to the exact dot. NOTE: currently UNUSED in the kernels — this
    lowering hit a Mosaic "Bad lhs type" compile error on the target
    toolchain when invoked from the engine's fused step (it compiled in a
    standalone micro-benchmark); the kernels use the HIGHEST-precision
    dots until the toolchain accepts it."""
    if a.dtype != jnp.float32:
        return _dot(a, b)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _stripe16_rows(t, F16, EQ16):
    """rows 0:16 of t <- F16 @ rows (other rows unchanged)."""
    stripe = _dot(F16, _dot(EQ16.T, t))                   # (16, TILE)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    return jnp.where(ridx < 16, _dot(EQ16, stripe), t)


def _stripe16_cols(t, F16, EQ16):
    """cols 0:16 of t <- cols @ F16ᵀ (other cols unchanged)."""
    stripe = _dot(_dot(t, EQ16), F16.T)                   # (TILE, 16)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    return jnp.where(cidx < 16, _dot(stripe, EQ16.T), t)


def _eq16(dtype):
    ridx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 16), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 16), 1)
    return (ridx == cidx).astype(dtype)


def _lowrank6(t, E_i, E_j, U_i, U_j, C):
    """t + E_iᵀU_j + U_iᵀE_j + E_iᵀ C E_j (rank-8-padded symmetric add)."""
    return (t + _dot(E_i.T, U_j) + _dot(U_i.T, E_j)
            + _dot(_dot(E_i.T, C), E_j))


def _k1_kernel(P_ref, keep_ref, E_ref, U_ref, C_ref, F_ref, Q_ref, Ht_ref,
               out_ref, pht_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    keep_i = keep_ref[0, pl.ds(i * TILE, TILE)]           # (TILE,)
    keep_j = keep_ref[0, pl.ds(j * TILE, TILE)]
    # Delete + pad masking in one where (keep is zero beyond D, so ragged
    # edge-tile garbage — NaN in interpret mode — never propagates).
    t = jnp.where((keep_i[:, None] > 0) & (keep_j[None, :] > 0),
                  P_ref[:], 0.0)
    # Conversion (rank-6): P += E6ᵀU6 + U6ᵀE6 + E6ᵀC66E6.
    E_i = E_ref[:, pl.ds(i * TILE, TILE)]                 # (8, TILE)
    E_j = E_ref[:, pl.ds(j * TILE, TILE)]
    U_i = U_ref[:, pl.ds(i * TILE, TILE)]
    U_j = U_ref[:, pl.ds(j * TILE, TILE)]
    t = _lowrank6(t, E_i, E_j, U_i, U_j, C_ref[0:8, 0:8])
    out_ref[:] = t

    # Predict: rows/cols 0:13 get F (padded to a 16-stripe, identity on
    # 13:16 so slot-0 dims pass through), corner adds Q.
    F16 = F_ref[0:16, 0:16]
    EQ = _eq16(t.dtype)

    @pl.when(i == 0)
    def _():
        out_ref[:] = _stripe16_rows(out_ref[:], F16, EQ)

    @pl.when(j == 0)
    def _():
        out_ref[:] = _stripe16_cols(out_ref[:], F16, EQ)

    @pl.when((i == 0) & (j == 0))
    def _():
        Q16 = Q_ref[0:16, 0:16]
        out_ref[:] += _dot(_dot(EQ, Q16), EQ.T)

    # P·Hᵀ accumulation over j (grid minor axis): PHt[iblock] += tile @ Htj.
    @pl.when(j == 0)
    def _():
        pht_ref[:] = jnp.zeros_like(pht_ref)
    pht_ref[:] += _dot(out_ref[:], Ht_ref[pl.ds(j * TILE, TILE), :])


def _pad_rows(a, rows, cols=None):
    """Zero-pad a 2D array to (rows, cols or a.shape[1])."""
    r, c = a.shape
    cols = c if cols is None else cols
    out = jnp.zeros((rows, cols), a.dtype)
    return jax.lax.dynamic_update_slice(out, a, (0, 0))


def _fused_manage_predict_single(P, keep, E6, U6, C66, F13, Q13, Ht):
    D = P.shape[0]
    R = Ht.shape[1]
    nt = pl.cdiv(D, TILE)
    Dp = nt * TILE
    Rp = pl.cdiv(R, 128) * 128
    dt = P.dtype
    keep_p = _pad_rows(keep[None, :], 1, Dp)
    E8 = _pad_rows(E6, 8, Dp)
    U8 = _pad_rows(U6, 8, Dp)
    C8 = _pad_rows(C66, 8, 128)
    F16 = jnp.eye(16, dtype=dt).at[0:13, 0:13].set(F13)
    F16 = _pad_rows(F16, 16, 128)
    Q16 = _pad_rows(Q13, 16, 128)
    Htp = jnp.zeros((Dp, Rp), dt)
    Htp = jax.lax.dynamic_update_slice(Htp, Ht, (0, 0))
    out, pht = pl.pallas_call(
        _k1_kernel,
        out_shape=(jax.ShapeDtypeStruct((D, D), dt),
                   jax.ShapeDtypeStruct((D, Rp), dt)),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((1, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((8, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((8, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((16, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((16, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, Rp), lambda i, j: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
                   pl.BlockSpec((TILE, Rp), lambda i, j: (i, 0))),
        interpret=_INTERPRET[0],
    )(P, keep_p, E8, U8, C8, F16, Q16, Htp)
    return out, pht[:, :R]


def fused_manage_predict_pht(P, keep, E6, U6, C66, F13, Q13, Ht):
    """P⁻ = Lp · (M∘P + E6ᵀU6 + U6ᵀE6 + E6ᵀC66E6) · Lpᵀ + Q̃ and
    PHt = P⁻ · Ht in ONE streamed pass over P.

    Lp = diag(F13, I) (predict_state_and_covariance.m:26-27); M∘ = keep
    outer-product mask (delete_features + padding); the rank-6 terms are
    the inverse-depth→cartesian conversion (inversedepth_2_cartesian.m:
    37-45, mapman.ManageParams). Ht: (D, R) dense measurement-Jacobian
    transpose (R = 2·CAP), giving the per-slot gain columns of
    search_IC_matches.m:8 for free. Batched via vmap.

    Returns (P_pred (D, D), PHt (D, R)).
    """
    if P.ndim == 2:
        return _fused_manage_predict_single(
            P, keep, E6, U6, C66, F13, Q13, Ht)
    return jax.vmap(fused_manage_predict_pht)(
        P, keep, E6, U6, C66, F13, Q13, Ht)


def _downdate_renorm(P_ref, K_ref, PHt_ref, Jq_ref, out_ref, i, j):
    """Shared tail core: out = T·sym(P − K·PHtᵀ)·Tᵀ for this tile (the body
    of the round-1 fused_update_tail kernel, update.m:13-24)."""
    Ki = K_ref[pl.ds(i * TILE, TILE), :]
    Kj = K_ref[pl.ds(j * TILE, TILE), :]
    PHti = PHt_ref[pl.ds(i * TILE, TILE), :]
    PHtj = PHt_ref[pl.ds(j * TILE, TILE), :]
    out = P_ref[:] - 0.5 * (_dot(Ki, PHtj.T) + _dot(PHti, Kj.T))

    Jq = Jq_ref[0:8, 0:8]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
    EQ = (ridx == cidx).astype(out.dtype)
    stripe_mask_r = (ridx[:, 0:1] < 8)

    @pl.when(i == 0)
    def _():
        stripe = _dot(Jq, _dot(EQ.T, out))
        out_ref[:] = jnp.where(stripe_mask_r, _dot(EQ, stripe), out)

    @pl.when(i != 0)
    def _():
        out_ref[:] = out

    @pl.when(j == 0)
    def _():
        cur = out_ref[:]
        stripe = _dot(_dot(cur, EQ), Jq.T)
        col_mask = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, TILE), 1) < 8
        out_ref[:] = jnp.where(col_mask, _dot(stripe, EQ.T), cur)


def _tail_pht_kernel(P_ref, K_ref, PHt_ref, Jq_ref, Ht_ref, dm_ref,
                     out_ref, pht_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    _downdate_renorm(P_ref, K_ref, PHt_ref, Jq_ref, out_ref, i, j)

    @pl.when(j == 0)
    def _():
        pht_ref[:] = jnp.zeros_like(pht_ref)
    # Mask ragged edge-tile columns (pad garbage) before the contraction.
    ok = dm_ref[0, pl.ds(j * TILE, TILE)] > 0             # (TILE,)
    final = jnp.where(ok[None, :], out_ref[:], 0.0)
    pht_ref[:] += _dot(final, Ht_ref[pl.ds(j * TILE, TILE), :])


def _tail_add_kernel(P_ref, K_ref, PHt_ref, Jq_ref, keep_ref, E_ref, U_ref,
                     C_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    _downdate_renorm(P_ref, K_ref, PHt_ref, Jq_ref, out_ref, i, j)
    keep_i = keep_ref[0, pl.ds(i * TILE, TILE)]
    keep_j = keep_ref[0, pl.ds(j * TILE, TILE)]
    t = jnp.where((keep_i[:, None] > 0) & (keep_j[None, :] > 0),
                  out_ref[:], 0.0)
    E_i = E_ref[:, pl.ds(i * TILE, TILE)]
    E_j = E_ref[:, pl.ds(j * TILE, TILE)]
    U_i = U_ref[:, pl.ds(i * TILE, TILE)]
    U_j = U_ref[:, pl.ds(j * TILE, TILE)]
    out_ref[:] = _lowrank6(t, E_i, E_j, U_i, U_j, C_ref[:])


def _tail_pht_single(P, K, PHt, Jq4, Ht):
    D = P.shape[0]
    R = Ht.shape[1]
    nt = pl.cdiv(D, TILE)
    Dp = nt * TILE
    Rp = pl.cdiv(R, 128) * 128
    M = K.shape[1]
    dt = P.dtype
    if Dp != D:
        K = jnp.concatenate([K, jnp.zeros((Dp - D, M), dt)])
        PHt = jnp.concatenate([PHt, jnp.zeros((Dp - D, M), dt)])
    Htp = jnp.zeros((Dp, Rp), dt)
    Htp = jax.lax.dynamic_update_slice(Htp, Ht, (0, 0))
    dmask = (jnp.arange(Dp) < D).astype(dt)[None, :]
    out, pht = pl.pallas_call(
        _tail_pht_kernel,
        out_shape=(jax.ShapeDtypeStruct((D, D), dt),
                   jax.ShapeDtypeStruct((D, Rp), dt)),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, Rp), lambda i, j: (0, 0)),
            pl.BlockSpec((1, Dp), lambda i, j: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
                   pl.BlockSpec((TILE, Rp), lambda i, j: (i, 0))),
        interpret=_INTERPRET[0],
    )(P, K, PHt, _pad_Jq(Jq4), Htp, dmask)
    return out, pht[:, :R]


def fused_update_tail_pht(P, K, PHt, Jq4, Ht):
    """K2: the LI-update covariance tail (downdate + symmetrize + quaternion
    renorm, update.m:13-24) AND the posterior gain columns
    PHt2 = P⁺ · Ht in the same single pass over P.

    Ht: (D, R) dense posterior measurement-Jacobian transpose (R = 2·CAP),
    linearized at the post-LI state — available before the kernel because
    the state update x⁺ = x⁻ + Kν needs no covariance. Returns
    (P_new (D, D), PHt2 (D, R)). Batched via vmap. Same precondition as
    fused_update_tail: P symmetric on entry.
    """
    if P.ndim == 2:
        return _tail_pht_single(P, K, PHt, Jq4, Ht)
    return jax.vmap(fused_update_tail_pht)(P, K, PHt, Jq4, Ht)


def _tail_add_single(P, K, PHt, Jq4, keepN, EN, UN, CN):
    D = P.shape[0]
    nt = pl.cdiv(D, TILE)
    Dp = nt * TILE
    M = K.shape[1]
    dt = P.dtype
    r = EN.shape[0]
    rp = max(8, pl.cdiv(r, 8) * 8)
    if rp > 128:
        raise ValueError(f"feature-add rank {r} > 128; use the XLA path")
    if Dp != D:
        K = jnp.concatenate([K, jnp.zeros((Dp - D, M), dt)])
        PHt = jnp.concatenate([PHt, jnp.zeros((Dp - D, M), dt)])
    keep_p = _pad_rows(keepN[None, :], 1, Dp)
    Ep = _pad_rows(EN, rp, Dp)
    Up = _pad_rows(UN, rp, Dp)
    Cp = _pad_rows(CN, rp, rp)
    return pl.pallas_call(
        _tail_add_kernel,
        out_shape=jax.ShapeDtypeStruct((D, D), dt),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, M), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((1, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((rp, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((rp, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((rp, rp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_INTERPRET[0],
    )(P, K, PHt, _pad_Jq(Jq4), keep_p, Ep, Up, Cp)


def fused_update_tail_add(P, K, PHt, Jq4, keepN, EN, UN, CN):
    """K3: the HI-update covariance tail AND the batched feature-init
    write-back P' = M∘P⁺ + ENᵀUN + UNᵀEN + ENᵀCNEN in one pass
    (ekf_update_hi_inliers.m + add_a_feature_covariance_inverse_depth.m:
    61-64; mapman.add_features_batch's low-rank form).

    keepN: (D,) zeroes the newly-assigned slots' dims; EN/UN: (6K, D) new
    row selectors / values (U columns pre-masked to old dims); CN:
    (6K, 6K) new-block covariance. 6K must be <= 128. Batched via vmap.
    """
    if P.ndim == 2:
        return _tail_add_single(P, K, PHt, Jq4, keepN, EN, UN, CN)
    return jax.vmap(fused_update_tail_add)(P, K, PHt, Jq4, keepN, EN, UN, CN)


def _corr_kernel(Pij_ref, At_ref, Bt_ref, out_ref):
    """out tile = P tile + Atᵀ·Bt restricted to the tile's rows/cols."""
    # Contraction over the (zero-row-padded) rank axis; dot_general with
    # contracting dims (0, 0) avoids materializing a transpose in-kernel.
    corr = _corr_dot(At_ref[:], Bt_ref[:], 0)
    out_ref[:] = (Pij_ref[:].astype(jnp.float32) + corr).astype(
        out_ref.dtype)


# In-kernel correction-dot lowering (EKF_CORR_PREC): "highest" = 6-pass
# exact-f32 MXU dots; "split3" = hand-rolled 3-pass hi/lo bf16 split
# (tensorfloat32-equivalent — what ekf.f32_matmuls pins in XLA; Mosaic
# does not lower Precision.HIGH so the split is manual); "default" =
# 1-pass bf16 (factor rounding ~2^-9 of the correction — the EKF_TAIL16
# accuracy class). At R = 2M+8 the dots are 47 GFLOP/update at B=512:
# 6-pass ≈ 2.9 ms/update of pure MXU time, which erases the kernel's
# HBM win — the pass count matters.
import os as _os
_CORR_PREC = _os.environ.get("EKF_CORR_PREC", "split3")


def _corr_dot(a, b, contract, mirror=False):
    """Rank-axis correction dot at the configured in-kernel precision.

    mirror=True swaps the split3 cross-term ADD ORDER (hh + lh + hl
    instead of hh + hl + lh): in the symmetrizing kernels the second dot
    of the pair ½(d(A,B) + d(B,A)) must sum its cross terms in the order
    that makes tile (i,j)'s expression the float-exact transpose of tile
    (j,i)'s — float addition is commutative but not associative."""
    dims = (((contract,), (contract,)), ((), ()))
    if _CORR_PREC == "highest" or a.dtype != jnp.float32:
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    if _CORR_PREC == "default":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    if mirror:
        return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _corr_expr_kernel(Pij_ref, Ati_ref, Atj_ref, Bti_ref, Btj_ref, out_ref):
    """out tile = Pij + ½(Atᵢᵀ·Btⱼ + Btᵢᵀ·Atⱼ): the CORRECTION is
    float-exactly symmetric (mirrored cross-term order) so it never seeds
    asymmetry, but P's own (ulp-level, non-compounding) asymmetry passes
    through — no transposed-tile read, one P pass."""
    corr = 0.5 * (_corr_dot(Ati_ref[:], Btj_ref[:], 0)
                  + _corr_dot(Bti_ref[:], Atj_ref[:], 0, mirror=True))
    out_ref[:] = (Pij_ref[:].astype(jnp.float32) + corr).astype(
        out_ref.dtype)


def _corr_sym_kernel(Pij_ref, Pji_ref, Ati_ref, Atj_ref, Bti_ref, Btj_ref,
                     out_ref):
    """out tile = ½(Pij + Pjiᵀ) + ½(Atᵢᵀ·Btⱼ + Btᵢᵀ·Atⱼ) — BITWISE
    symmetric by construction: the (j, i) tile's expression is the exact
    transpose of the (i, j) tile's (same products, same contraction
    order, commutative adds), so P⁺ never carries asymmetry forward."""
    sym_p = 0.5 * (Pij_ref[:].astype(jnp.float32)
                   + Pji_ref[:].astype(jnp.float32).T)
    corr = 0.5 * (_corr_dot(Ati_ref[:], Btj_ref[:], 0)
                  + _corr_dot(Bti_ref[:], Atj_ref[:], 0, mirror=True))
    out_ref[:] = (sym_p + corr).astype(out_ref.dtype)


def _corr_apply_single(P, At, Bt, symmetrize):
    D = P.shape[0]
    nt = pl.cdiv(D, TILE)
    R = At.shape[0]
    Rp = max(8, pl.cdiv(R, 8) * 8)
    if Rp != R:
        # Zero row-padding: the contraction runs over all Rp rows.
        At = jnp.concatenate([At, jnp.zeros((Rp - R, D), At.dtype)])
        Bt = jnp.concatenate([Bt, jnp.zeros((Rp - R, D), Bt.dtype)])
    if symmetrize == "none" or symmetrize is False:
        return pl.pallas_call(
            _corr_kernel,
            out_shape=jax.ShapeDtypeStruct((D, D), P.dtype),
            grid=(nt, nt),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, i)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            interpret=_INTERPRET[0],
        )(P, At, Bt)
    if symmetrize == "expr":
        return pl.pallas_call(
            _corr_expr_kernel,
            out_shape=jax.ShapeDtypeStruct((D, D), P.dtype),
            grid=(nt, nt),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, i)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, j)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, i)),
                pl.BlockSpec((Rp, TILE), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            interpret=_INTERPRET[0],
        )(P, At, At, Bt, Bt)
    # Edge-tile note: the transposed (j, i) read's unspecified padding
    # lanes transpose into exactly the out-of-range rows/cols of the
    # (i, j) output tile, which the store masks — no padding of P needed.
    return pl.pallas_call(
        _corr_sym_kernel,
        out_shape=jax.ShapeDtypeStruct((D, D), P.dtype),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((TILE, TILE), lambda i, j: (j, i)),
            pl.BlockSpec((Rp, TILE), lambda i, j: (0, i)),
            pl.BlockSpec((Rp, TILE), lambda i, j: (0, j)),
            pl.BlockSpec((Rp, TILE), lambda i, j: (0, i)),
            pl.BlockSpec((Rp, TILE), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_INTERPRET[0],
    )(P, P, At, At, Bt, Bt)


def _corr_sym_cols_kernel(Pij_ref, Pji_ref, Ai_ref, Aj_ref, Bi_ref, Bj_ref,
                          out_ref):
    """Column-factor twin of _corr_sym_kernel:
    out tile = ½(Pij + Pjiᵀ) + ½(Aᵢ·Bⱼᵀ + Bᵢ·Aⱼᵀ), A/B (D, R)."""
    sym_p = 0.5 * (Pij_ref[:].astype(jnp.float32)
                   + Pji_ref[:].astype(jnp.float32).T)
    corr = 0.5 * (_corr_dot(Ai_ref[:], Bj_ref[:], 1)
                  + _corr_dot(Bi_ref[:], Aj_ref[:], 1, mirror=True))
    out_ref[:] = (sym_p + corr).astype(out_ref.dtype)


def _corr_apply_cols_single(P, A, B):
    D = P.shape[0]
    nt = pl.cdiv(D, TILE)
    R = A.shape[1]
    Rp = max(128, pl.cdiv(R, 128) * 128)
    if Rp != R:
        # Zero lane-padding of the contraction axis.
        A = jnp.concatenate([A, jnp.zeros((D, Rp - R), A.dtype)], axis=1)
        B = jnp.concatenate([B, jnp.zeros((D, Rp - R), B.dtype)], axis=1)
    return pl.pallas_call(
        _corr_sym_cols_kernel,
        out_shape=jax.ShapeDtypeStruct((D, D), P.dtype),
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            pl.BlockSpec((TILE, TILE), lambda i, j: (j, i)),
            pl.BlockSpec((TILE, Rp), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, Rp), lambda i, j: (j, 0)),
            pl.BlockSpec((TILE, Rp), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, Rp), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_INTERPRET[0],
    )(P, P, A, A, B, B)


def corr_apply_cols(P: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray):
    """P⁺ = sym(P) + ½(A·Bᵀ + B·Aᵀ) in one pass over P — corr_apply for
    COLUMN-form factors (D, R), the ekf.update folded-tail layout
    (A = Ā, B = B̄ of the rank-(2M+8) correction). Always symmetrizes
    (bitwise, same construction as corr_apply). Batched via vmap."""
    if P.ndim == 2:
        return _corr_apply_cols_single(P, A, B)
    return jax.vmap(corr_apply_cols)(P, A, B)


def corr_apply(P: jnp.ndarray, At: jnp.ndarray, Bt: jnp.ndarray,
               symmetrize="full"):
    """P⁺ = sym(P) + sym(Atᵀ·Bt) in ONE pass over P — the row-form folded
    update tail's final apply (ekf.update_rows; update.m:13-24 with the
    quaternion-renorm transform already folded into the factors, and the
    reference's explicit P=(P+Pᵀ)/2 symmetrization of update.m:14 fused
    into the same pass).

    The XLA form materializes the f32 correction dot output (a full-P-
    sized array) before the elementwise add + storage cast can consume
    it — on the bf16-stored fast path that is 3 extra full-P-sized HBM
    touches per update. Here each P tile is read (plus its transposed
    twin when symmetrize=True), the rank-R correction for that tile is
    computed from VMEM-resident At/Bt column blocks on the MXU (HIGHEST
    precision: exact-f32 dots, compute is negligible at R ≈ 2M+8), and
    the sum is stored once in P's storage dtype.

    symmetrize ∈ {"full", "expr", "none"}: "full" emits a BITWISE-
    symmetric P⁺ (= ½(P+Pᵀ) + sym-corr; reads each tile's transposed
    twin too — wipes any accumulated asymmetry); "expr" adds a float-
    exactly-symmetric CORRECTION to P as-is (one P read, no transpose;
    P's own non-compounding ulp asymmetry passes through — sufficient to
    keep the EKF_UPDATE=rows path stable, whose shared H·P read assumes
    HP ≡ (PHᵀ)ᵀ: an asymmetric correction seed compounds geometrically
    through the S → W → corr feedback until P goes indefinite,
    tools/probe_rows_nan.py finding); "none" is the raw P + AtᵀBt.

    P: (..., D, D) f32 or bf16 storage; At, Bt: (..., R, D) f32 factors.
    Returns P⁺ in P's dtype. Batched via vmap.
    """
    if P.ndim == 2:
        return _corr_apply_single(P, At, Bt, symmetrize)
    return jax.vmap(lambda p, a, b: corr_apply(p, a, b, symmetrize))(
        P, At, Bt)


def pallas_supported() -> bool:
    """True when the default backend lowers Pallas TPU kernels."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


def _ncc_corr_kernel(win_ref, tm_ref, out_ref):
    """Zero-mean-template correlation with the PAIR index in lanes:
    win (W2, W2, 128), tm (t², 128) -> out (R2, R2, 128), all f32.
    out[oy, ox, n] = Σ_{dy,dx} win[oy+dy, ox+dx, n] · tm[dy·t+dx, n] —
    t² statically-unrolled vector FMAs over (R2, R2, 128) tiles. No
    dots, so no in-kernel precision pin is needed (pure f32 VPU math)."""
    R2 = out_ref.shape[0]
    t = int(round(tm_ref.shape[0] ** 0.5))
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for dy in range(t):
        for dx in range(t):
            acc = acc + (win_ref[dy:dy + R2, dx:dx + R2, :]
                         * tm_ref[dy * t + dx, :][None, None, :])
    out_ref[...] = acc


def ncc_corr(windows: jnp.ndarray, tm: jnp.ndarray) -> jnp.ndarray:
    """Correlation numerator of the NCC matcher for N (window, template)
    pairs: windows (N, W2, W2), tm (N, t, t) ZERO-MEAN templates ->
    (N, R2, R2), R2 = W2 − t + 1, f32.

    XLA's grouped-conv lowering of this op runs one MXU pass per feature
    group — 82% of the whole image-path step at the pixels-bench
    operating point despite the entire input being ~35 MB (pixels HLO
    dump, docs/BENCH.md r2k). Here pairs ride the 128-lane axis and the
    t² kernel taps are unrolled as fused vector FMAs. Batched via vmap
    (leading batch axes become extra grid axes)."""
    if windows.ndim > 3:
        return jax.vmap(ncc_corr)(windows, tm)
    N, W2, _ = windows.shape
    t = tm.shape[-1]
    R2 = W2 - t + 1
    lanes = 128
    Np = pl.cdiv(N, lanes) * lanes
    winT = jnp.moveaxis(windows, 0, -1)                 # (W2, W2, N)
    tmT = tm.reshape(N, t * t).T                        # (t², N)
    if Np != N:
        winT = jnp.pad(winT, ((0, 0), (0, 0), (0, Np - N)))
        tmT = jnp.pad(tmT, ((0, 0), (0, Np - N)))
    out = pl.pallas_call(
        _ncc_corr_kernel,
        out_shape=jax.ShapeDtypeStruct((R2, R2, Np), jnp.float32),
        grid=(Np // lanes,),
        in_specs=[
            pl.BlockSpec((W2, W2, lanes), lambda i: (0, 0, i)),
            pl.BlockSpec((t * t, lanes), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((R2, R2, lanes), lambda i: (0, 0, i)),
        interpret=_INTERPRET[0],
    )(winT.astype(jnp.float32), tmT.astype(jnp.float32))
    return jnp.moveaxis(out, -1, 0)[:N]
