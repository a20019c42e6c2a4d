"""1-point RANSAC, vmapped over a fixed hypothesis batch (L4).

The reference (ransac_hypotheses.m:1-47) runs a sequential adaptive loop:
draw one IC match, do a 1-match *state-only* EKF update (K = P Hᵢᵀ Sᵢ⁻¹,
xᵢ = x⁻ + K(zᵢ − hᵢ), ransac_hypotheses.m:20-26), reproject all matched
features under xᵢ and count residuals below σ_z
(compute_hypothesis_support_fast.m:29-45,68-84), keeping the best and
shrinking the iteration budget via n = log(1−p)/log(ε̂).

TPU re-design: `cfg.ransac.num_hypotheses` hypotheses are drawn and scored
in parallel (one vmap), and the argmax-support hypothesis wins. For any
inlier ratio where the reference's own adaptive formula terminates within
that budget, the fixed batch stochastically dominates the sequential loop
(it evaluates at least as many independent draws); see
tests/test_ransac.py::test_fixed_batch_support_matches_sequential.

The support projection follows compute_hypothesis_support_fast exactly:
plain project+distort of every *matched* feature (no FoV/in-image gating)
with residual threshold = σ_z (ransac_hypotheses.m:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import CAM_DIM, EngineConfig
from ekf_slam_tpu.filter import association
from ekf_slam_tpu.filter.ekf import f32_matmuls as _f32
from ekf_slam_tpu.ops import camera as cam_ops
from ekf_slam_tpu.ops import quaternion as quat


def sample_ic_indices(key: jax.Array, ic_mask: jnp.ndarray,
                      num: int) -> jnp.ndarray:
    """Draw `num` slot indices uniformly among IC matches
    (select_random_match.m:1-21). Falls back to slot 0 when no IC match
    exists (callers mask the whole RANSAC phase on that case)."""
    cap = ic_mask.shape[0]
    n_ic = jnp.sum(ic_mask)
    u = jax.random.uniform(key, (num,))
    ranks = jnp.floor(u * n_ic).astype(jnp.int32)        # in [0, n_ic)
    # slot of the k-th IC match: first index where cumsum(ic) == k+1
    csum = jnp.cumsum(ic_mask.astype(jnp.int32))
    # searchsorted over the monotone cumsum gives the first such slot.
    slots = jnp.searchsorted(csum, ranks + 1)
    return jnp.clip(slots, 0, cap - 1)


def support_projection(x_hyp: jnp.ndarray, cartesian: jnp.ndarray,
                       cfg: EngineConfig) -> jnp.ndarray:
    """Reproject every slot under hypothesis state x_hyp — the batched
    reprojection of compute_hypothesis_support_fast.m (no gating).
    Returns (CAP, 2) distorted pixels."""
    cap = cartesian.shape[0]
    cam = cfg.camera
    slots = x_hyp[CAM_DIM:].reshape(cap, 6)
    t_wc = x_hyp[0:3]
    R_wc = quat.q2r(x_hyp[3:7])
    y3 = slots[:, 0:3]
    mi = quat.azel_to_ray(slots[:, 3], slots[:, 4])
    v_id = (y3 - t_wc) * slots[:, 5:6] + mi
    v = jnp.where(cartesian[:, None], y3 - t_wc, v_id)
    hc = v @ R_wc
    # Avoid 0/0 on dead slots (projection of the origin).
    hz = jnp.where(hc[:, 2] == 0, jnp.ones_like(hc[:, 2]), hc[:, 2])
    hc = hc.at[:, 2].set(hz)
    return cam_ops.distort(cam_ops.project(hc, cam), cam)


@_f32
def run(x: jnp.ndarray, P: jnp.ndarray, z: jnp.ndarray, h: jnp.ndarray,
        H_xv: jnp.ndarray, H_y: jnp.ndarray, S: jnp.ndarray,
        ic_mask: jnp.ndarray, cartesian: jnp.ndarray, key: jax.Array,
        cfg: EngineConfig, pht: jnp.ndarray = None):
    """Full 1-point RANSAC. Returns (li_mask, best_support).

    x, P: prior state/covariance. z/h/S: per-slot measurements, predictions
    and innovation covariances from the prior. H_xv (CAP,2,13) / H_y
    (CAP,2,6): per-slot Jacobian blocks. ic_mask: IC slots. pht: optional
    precomputed per-slot gain columns (D, 2·CAP) — the engine shares one
    measurement.pht_slots result between RANSAC and the LI update.
    """
    cap = ic_mask.shape[0]
    nhyp = cfg.ransac.num_hypotheses
    thr = cfg.filter.sigma_z  # RANSAC threshold = std_z (ransac_hypotheses.m:6)

    from ekf_slam_tpu.filter import ekf as _ekf
    from ekf_slam_tpu.filter import measurement
    if pht is None and _ekf._PHT_FORM == "rows":
        # Symmetric row form: one natural-layout P read, no transposed-
        # layout copy of P (measurement.pht_slots_rows). (CAP, 2, D).
        pht2 = measurement.pht_slots_rows(P, H_xv, H_y).reshape(2 * cap, -1)
        apply_picks = lambda A: jnp.einsum("md,mn->dn", pht2, A)
    else:
        pht2 = measurement.pht_slots(P, H_xv, H_y) if pht is None \
            else pht                                      # (D, 2·CAP)
        apply_picks = lambda A: pht2 @ A

    picks = sample_ic_indices(key, ic_mask, nhyp)         # (NHYP,)

    # All NHYP 1-match state updates as ONE matmul: x_hyp_n = x + P Hₙᵀ wₙ
    # with wₙ = Sₙ⁻¹ νₙ. A (2·CAP, NHYP) scatters each pick's w into its
    # slot's two columns via a one-hot product — the previous per-pick
    # gather of (D, 2) gain columns materialized a (NHYP, D, 2) array
    # whose minor dim 2 pads to 128 lanes on TPU (64x HBM blowup, the #1
    # op in the optimized HLO, docs/BENCH.md round 2).
    nu_p = z[picks] - h[picks]                            # (NHYP, 2)
    w_p = jax.vmap(association._solve_2x2)(S[picks], nu_p)
    onehot = jax.nn.one_hot(picks, cap, dtype=x.dtype)    # (NHYP, CAP)
    A = jnp.einsum("nc,nj->cjn", onehot, w_p).reshape(2 * cap, nhyp)
    x_hyps = x[:, None] + apply_picks(A)                  # (D, NHYP)

    def one_hypothesis(x_hyp):
        h_all = support_projection(x_hyp, cartesian, cfg)
        res2 = jnp.sum((z - h_all) ** 2, axis=-1)
        inlier = ic_mask & (res2 < thr * thr)
        return inlier, jnp.sum(inlier)

    inliers, supports = jax.vmap(one_hypothesis, in_axes=1)(x_hyps)
    best = jnp.argmax(supports)
    any_ic = jnp.any(ic_mask)
    li_mask = inliers[best] & any_ic
    return li_mask, jnp.where(any_ic, supports[best], 0)
