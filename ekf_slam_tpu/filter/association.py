"""Data association: individual compatibility + two-phase inlier logic (L4).

In the reference, `matching.m` searches FAST corners inside the ±2σ ellipse
and χ²-gates candidates against S (matching.m:16-47). The engine separates
concerns: candidate pixel measurements come from a front-end (the synthetic
scene simulator, sim/scene.py, or the NCC/descriptor matcher, vision/), and
this module applies the *filter-side* acceptance logic, vectorized over all
slots:

* individual compatibility — predicted-visible AND a measurement exists AND
  the innovation passes the χ²(2, 95%) gate νᵀS⁻¹ν < 5.9915 (matching.m:38)
  AND the search ellipse is not degenerate: eig(S) < 100 (matching.m:16).
* high-innovation rescue — after the low-innovation update, re-gate the
  not-yet-inlier IC matches with νᵀS⁻¹ν < 5.9915 where S = H P Hᵀ *without*
  R, matching rescue_hi_inliers.m:13 exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ekf_slam_tpu.config import EngineConfig


def _solve_2x2(S: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched S⁻¹ v for (…,2,2) SPD S and (…,2) v via the adjugate."""
    det = S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]
    safe_det = jnp.where(det == 0, jnp.ones_like(det), det)
    x0 = (S[..., 1, 1] * v[..., 0] - S[..., 0, 1] * v[..., 1]) / safe_det
    x1 = (-S[..., 1, 0] * v[..., 0] + S[..., 0, 0] * v[..., 1]) / safe_det
    return jnp.stack([x0, x1], axis=-1)


def mahalanobis2(nu: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """νᵀ S⁻¹ ν for batched 2-vectors/2x2 matrices."""
    return jnp.sum(nu * _solve_2x2(S, nu), axis=-1)


def max_eig_2x2(S: jnp.ndarray) -> jnp.ndarray:
    """Largest eigenvalue of symmetric 2x2 blocks (matching.m:16 gate)."""
    tr = S[..., 0, 0] + S[..., 1, 1]
    det = S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 + disc


def individually_compatible(z: jnp.ndarray, z_valid: jnp.ndarray,
                            h: jnp.ndarray, visible: jnp.ndarray,
                            S: jnp.ndarray, cfg: EngineConfig) -> jnp.ndarray:
    """IC mask over slots (matching.m acceptance logic).

    z: (CAP,2) candidate measurements; z_valid: (CAP,) bool (a measurement
    was produced for this slot); h, S: predictions from the prior.
    """
    mc = cfg.matching
    nu = z - h
    gate_chi2 = mahalanobis2(nu, S) < mc.chi2_inv_2_95
    gate_eig = max_eig_2x2(S) < mc.max_innovation_eig
    return z_valid & visible & gate_chi2 & gate_eig


def rescue_high_innovation(z: jnp.ndarray, h_post: jnp.ndarray,
                           S_noR: jnp.ndarray, ic: jnp.ndarray,
                           li: jnp.ndarray, cfg: EngineConfig) -> jnp.ndarray:
    """HI mask: IC matches not already LI whose posterior innovation passes
    the χ² gate with S = H P Hᵀ (no R) — rescue_hi_inliers.m:6-21."""
    nu = z - h_post
    gate = mahalanobis2(nu, S_noR) < cfg.matching.chi2_inv_2_95
    return ic & ~li & gate
