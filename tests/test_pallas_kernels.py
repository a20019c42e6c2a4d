"""Pallas fused-update-tail kernel vs the XLA reference path (interpret
mode on CPU; the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.ops import pallas_kernels as pk
from ekf_slam_tpu.ops import quaternion as quat


def _reference_tail(P, K, PHt, Jq):
    A = 0.5 * (P - K @ PHt.T)
    B = A + A.T
    rows = Jq @ B[3:7, :]
    B = jnp.concatenate([B[:3], rows, B[7:]], axis=0)
    cols = B[:, 3:7] @ Jq.T
    return jnp.concatenate([B[:, :3], cols, B[:, 7:]], axis=1)


def test_fused_update_tail_matches_reference():
    D, M = 210, 48            # deliberately NOT a multiple of the tile size
    key = jax.random.key(0)
    kP, kK, kH, kq = jax.random.split(key, 4)
    A = jax.random.normal(kP, (D, D), jnp.float32) * 0.1
    P = A @ A.T + jnp.eye(D)
    K = jax.random.normal(kK, (D, M), jnp.float32) * 0.05
    PHt = jax.random.normal(kH, (D, M), jnp.float32) * 0.05
    q = jax.random.normal(kq, (4,), jnp.float32)
    Jq = quat.norm_jac(q / jnp.linalg.norm(q) * 1.01)

    ref = _reference_tail(P, K, PHt, Jq)
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.fused_update_tail(P, K, PHt, Jq)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_update_tail_batched():
    B, D, M = 3, 140, 16
    key = jax.random.key(1)
    A = jax.random.normal(key, (B, D, D), jnp.float32) * 0.1
    P = A @ jnp.swapaxes(A, 1, 2) + jnp.eye(D)
    K = jax.random.normal(key, (B, D, M), jnp.float32) * 0.05
    PHt = jax.random.normal(key, (B, D, M), jnp.float32) * 0.05
    Jq = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))

    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.fused_update_tail(P, K, PHt, Jq)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    ref = jax.vmap(_reference_tail)(P, K, PHt, Jq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_f32_matmul_big_matches_xla():
    D1, D2, M = 210, 185, 48     # non-tile-divisible on both axes
    key = jax.random.key(2)
    A = jax.random.normal(key, (D1, D2), jnp.float32)
    B = jax.random.normal(jax.random.key(3), (D2, M), jnp.float32)
    ref = A @ B
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.f32_matmul_big(A, B)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-5)
    # batched
    Ab = jnp.stack([A, 2 * A])
    Bb = jnp.stack([B, B])
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got_b = pk.f32_matmul_big(Ab, Bb)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    np.testing.assert_allclose(np.asarray(got_b[1]), np.asarray(2 * A @ B),
                               atol=2e-3, rtol=1e-5)


def test_fused_update_tail_bf16_storage():
    """bf16-stored P: the kernel upcasts on read, computes in f32 and
    rounds on store — matches the XLA fast-mode tail (compute on the
    upcast P, one bf16 rounding at the end) to bf16 resolution."""
    D, M = 210, 48
    key = jax.random.key(3)
    kP, kK, kH, kq = jax.random.split(key, 4)
    A = jax.random.normal(kP, (D, D), jnp.float32) * 0.1
    P32 = A @ A.T + jnp.eye(D)
    P16 = P32.astype(jnp.bfloat16)
    K = jax.random.normal(kK, (D, M), jnp.float32) * 0.05
    PHt = jax.random.normal(kH, (D, M), jnp.float32) * 0.05
    q = jax.random.normal(kq, (4,), jnp.float32)
    Jq = quat.norm_jac(q / jnp.linalg.norm(q) * 1.01)

    ref = _reference_tail(P16.astype(jnp.float32), K, PHt, Jq)
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.fused_update_tail(P16, K, PHt, Jq)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_corr_apply_matches_xla():
    # R deliberately not a sublane multiple, D not a tile multiple;
    # f32 storage. symmetrize=False: P + At^T Bt exactly;
    # symmetrize=True: sym(P) + 0.5(At^T Bt + Bt^T At), BITWISE symmetric.
    D, R = 210, 104
    key = jax.random.key(4)
    kP, kA, kB = jax.random.split(key, 3)
    A = jax.random.normal(kP, (D, D), jnp.float32) * 0.1
    P = A @ A.T + jnp.eye(D)
    P = 0.5 * (P + P.T)
    At = jax.random.normal(kA, (R, D), jnp.float32) * 0.05
    Bt = jax.random.normal(kB, (R, D), jnp.float32) * 0.05
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got_plain = pk.corr_apply(P, At, Bt, symmetrize=False)
        got_sym = pk.corr_apply(P, At, Bt)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    np.testing.assert_allclose(np.asarray(got_plain),
                               np.asarray(P + At.T @ Bt),
                               atol=1e-6, rtol=1e-6)
    ref_sym = 0.5 * (P + P.T) + 0.5 * (At.T @ Bt + Bt.T @ At)
    np.testing.assert_allclose(np.asarray(got_sym), np.asarray(ref_sym),
                               atol=1e-6, rtol=1e-6)
    gs = np.asarray(got_sym)
    assert np.array_equal(gs, gs.T), "symmetrized output must be bitwise sym"


def test_corr_apply_bf16_storage_batched():
    B, D, R = 3, 140, 30
    key = jax.random.key(5)
    kP, kA, kB = jax.random.split(key, 3)
    A = jax.random.normal(kP, (B, D, D), jnp.float32) * 0.1
    P32 = A @ jnp.swapaxes(A, 1, 2) + jnp.eye(D)
    P16 = P32.astype(jnp.bfloat16)
    At = jax.random.normal(kA, (B, R, D), jnp.float32) * 0.05
    Bt = jax.random.normal(kB, (B, R, D), jnp.float32) * 0.05
    ref = P16.astype(jnp.float32) + jnp.einsum("brd,bre->bde", At, Bt)
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.corr_apply(P16, At, Bt, symmetrize=False)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_corr_apply_cols_matches_rows():
    # Column-factor kernel == row-factor kernel on transposed factors,
    # and == the XLA symmetric form; bitwise symmetric output.
    D, R = 210, 104
    key = jax.random.key(6)
    kP, kA, kB = jax.random.split(key, 3)
    Q = jax.random.normal(kP, (D, D), jnp.float32) * 0.1
    P = Q @ Q.T + jnp.eye(D)
    P = 0.5 * (P + P.T)
    A = jax.random.normal(kA, (D, R), jnp.float32) * 0.05
    B = jax.random.normal(kB, (D, R), jnp.float32) * 0.05
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.corr_apply_cols(P, A, B)
        got_rows = pk.corr_apply(P, A.T, B.T)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    ref = 0.5 * (P + P.T) + 0.5 * (A @ B.T + B @ A.T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got_rows),
                               atol=1e-6, rtol=1e-6)
    g = np.asarray(got)
    assert np.array_equal(g, g.T)


def test_corr_apply_split3_accuracy():
    # The 3-pass hi/lo bf16 split (the default in-kernel lowering, ==
    # the XLA tensorfloat32 class) must track the exact-f32 correction
    # to ~2^-16 relative of the correction magnitude.
    D, R = 210, 104
    key = jax.random.key(7)
    kP, kA, kB = jax.random.split(key, 3)
    Q = jax.random.normal(kP, (D, D), jnp.float32) * 0.1
    P = Q @ Q.T + jnp.eye(D)
    P = 0.5 * (P + P.T)
    At = jax.random.normal(kA, (R, D), jnp.float32) * 0.05
    Bt = jax.random.normal(kB, (R, D), jnp.float32) * 0.05
    ref = 0.5 * (P + P.T) + 0.5 * (At.T @ Bt + Bt.T @ At)
    pk._INTERPRET[0] = True
    prec = pk._CORR_PREC
    pk._CORR_PREC = "split3"
    try:
        got = pk.corr_apply(P, At, Bt)
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = prec
    scale = float(np.abs(np.asarray(At.T @ Bt)).max())
    err = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
    assert err < 1e-4 * max(scale, 1.0), (err, scale)
    g = np.asarray(got)
    assert np.array_equal(g, g.T)


def test_corr_apply_expr_mode():
    # "expr": P passes through untouched, correction is the symmetric
    # pair — matches the XLA stacked-sym form; exact at highest.
    D, R = 210, 104
    key = jax.random.key(8)
    kP, kA, kB = jax.random.split(key, 3)
    P = jax.random.normal(kP, (D, D), jnp.float32)  # deliberately asym
    At = jax.random.normal(kA, (R, D), jnp.float32) * 0.05
    Bt = jax.random.normal(kB, (R, D), jnp.float32) * 0.05
    ref = P + 0.5 * (At.T @ Bt + Bt.T @ At)
    pk._INTERPRET[0] = True
    _prec = pk._CORR_PREC
    pk._CORR_PREC = "highest"
    try:
        got = pk.corr_apply(P, At, Bt, symmetrize="expr")
    finally:
        pk._INTERPRET[0] = False
        pk._CORR_PREC = _prec
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    # P's own asymmetry must pass through unamplified: got - got.T stays
    # within float rounding of P - P.T (the correction itself is
    # symmetric by the mirrored construction).
    d_got = np.asarray(got) - np.asarray(got).T
    d_p = np.asarray(P) - np.asarray(P).T
    assert np.abs(d_got - d_p).max() < 1e-6


def test_ncc_corr_matches_conv_form():
    """ops.pallas_kernels.ncc_corr (interpret mode) equals the grouped-
    conv NCC numerator, batched and unbatched, incl. non-multiple-of-128
    pair counts."""
    import numpy as np
    from ekf_slam_tpu.ops import pallas_kernels as pk
    from ekf_slam_tpu.vision import ncc
    rng = np.random.default_rng(9)
    win = jnp.asarray(rng.uniform(0, 1, (100, 37, 37)).astype(np.float32))
    tpl = jnp.asarray(rng.uniform(0, 1, (100, 13, 13)).astype(np.float32))
    old_form = ncc._FORM
    try:
        ncc._FORM = "conv"
        want = np.asarray(ncc.ncc_scores_all(win, tpl))
        pk._INTERPRET[0] = True
        ncc._FORM = "pallas"
        got = np.asarray(ncc.ncc_scores_all(win, tpl))
        got_b = np.asarray(jax.vmap(ncc.ncc_scores_all)(
            jnp.stack([win, win * 0.5 + 0.1]), jnp.stack([tpl, tpl])))
    finally:
        pk._INTERPRET[0] = False
        ncc._FORM = old_form
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(got_b[0], got, atol=1e-6)
    np.testing.assert_array_equal(
        want.reshape(100, -1).argmax(-1), got.reshape(100, -1).argmax(-1))
