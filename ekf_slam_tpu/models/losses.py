"""CALC2 training losses ("CALC 2.0"/calc2.py:271-318, utils.py:278-307).

total = segloss + 1e-4 * kld + 1e-4 * recloss + simloss   (calc2.py:315-318)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_negative_mine(descr: jnp.ndarray) -> jnp.ndarray:
    """In-batch hardest negative per row (utils.py:278-307): the most
    similar OTHER descriptor — diagonal excluded by subtracting 3 from the
    self-similarity (cosine sim can never reach -2)."""
    sim = descr @ descr.T
    n = descr.shape[0]
    sim = sim - 3.0 * jnp.eye(n, dtype=descr.dtype)
    ids = jnp.argmax(sim, axis=-1)
    return descr[ids]


def triplet_loss(descr: jnp.ndarray, descr_p: jnp.ndarray,
                 descr_n: jnp.ndarray, margin: float = 0.5) -> jnp.ndarray:
    """Hinge triplet on cosine similarities (calc2.py:276-279)."""
    lp = jnp.sum(descr_p * descr, axis=-1)
    ln = jnp.sum(descr_n * descr, axis=-1)
    return jnp.mean(jnp.maximum(0.0, ln + margin - lp))


def infonce_loss(descr: jnp.ndarray, descr_p: jnp.ndarray,
                 tau: float = 0.01) -> jnp.ndarray:
    """Temperature-scaled in-batch contrastive similarity loss (opt-in
    alternative to the reference triplet for the perceptual-aliasing
    regime; the triplet stays the parity default).

    Why: under aliasing, true-pair and sibling-impostor similarities are
    compressed into [0.98, 1] — the NetVLAD-pooled descriptor bounds
    sibling separation by the differing-content fraction (~2 of 48
    Voronoi cells over only H/32 x W/32 latent locations) — so the
    reference's margin-0.5 hinge is unsatisfiable: measured simloss sits
    pinned at ~0.502 for all 4000 steps and training shifts ALL sims
    down uniformly with no relative separation (runs/r3f: trained p50
    true-revisit 0.9866 vs aliased-impostor 0.9865; plain-retrieval
    PR-AUC 0.716 -> 0.637). Dividing the in-batch similarity row by
    tau << margin before the softmax rescales those few-milli cosine
    gaps into O(1) logit gaps, concentrating gradient on exactly the
    near-duplicate negatives the hinge treats as hopeless.

    positives: the warped view (row-aligned descr_p); negatives: every
    other in-batch descriptor (self excluded as in hard_negative_mine).
    """
    n = descr.shape[0]
    sim_pos = jnp.sum(descr * descr_p, axis=-1)            # (B,)
    sim_neg = descr @ descr.T - 3.0 * jnp.eye(n, dtype=descr.dtype)
    logits = jnp.concatenate([sim_pos[:, None], sim_neg], axis=1) / tau
    return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])


def seg_loss(seg_logits: jnp.ndarray, labels_onehot: jnp.ndarray,
             class_weights: jnp.ndarray) -> jnp.ndarray:
    """Class-weighted softmax cross-entropy (calc2.py:287-294). Weights are
    normalized by their minimum as in the reference (calc2.py:292)."""
    w = class_weights / jnp.min(class_weights)
    p = jnp.clip(jax_softmax(seg_logits), 1e-6, 1.0)
    ce = -jnp.sum(labels_onehot * w * jnp.log(p), axis=-1)
    return jnp.mean(ce)


def jax_softmax(x):
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def recon_loss(rec: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli reconstruction CE summed over pixels, batch mean
    (calc2.py:296-299)."""
    rec = jnp.clip(rec, 1e-10, 1.0 - 1e-10)
    ce = images * jnp.log(rec) + (1.0 - images) * jnp.log(1.0 - rec)
    return jnp.mean(-jnp.sum(ce, axis=(1, 2, 3)))


def kld_loss(mu: jnp.ndarray, log_sig_sq: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) (calc2.py:301-309)."""
    m = mu.reshape(mu.shape[0], -1)
    s = log_sig_sq.reshape(log_sig_sq.shape[0], -1)
    return jnp.mean(-0.5 * jnp.sum(1.0 + s - m * m - jnp.exp(s), axis=-1))


def total_loss(outs, outs_warp_descr, images, labels_onehot, class_weights,
               margin: float = 0.5, sim_objective: str = "triplet",
               sim_tau: float = 0.01):
    """The 4-term CALC2 objective; returns (loss, metrics dict).

    sim_objective: "triplet" (reference parity, calc2.py:276-279) or
    "infonce" (temperature-scaled contrastive — see infonce_loss for the
    aliasing-regime rationale). Metrics always report the raw positive /
    hardest-negative cosine means (sim_pos / sim_neg) so separation is
    observable regardless of objective.
    """
    descr_n = hard_negative_mine(outs["descriptor"])
    if sim_objective == "infonce":
        simloss = infonce_loss(outs["descriptor"], outs_warp_descr, sim_tau)
    else:
        simloss = triplet_loss(outs["descriptor"], outs_warp_descr, descr_n,
                               margin)
    segloss = seg_loss(outs["seg"], labels_onehot, class_weights)
    recloss = recon_loss(outs["rec"], images)
    kld = kld_loss(outs["mu"], outs["log_sig_sq"])
    loss = segloss + 1e-4 * kld + 1e-4 * recloss + simloss
    sim_pos = jnp.mean(jnp.sum(outs["descriptor"] * outs_warp_descr, -1))
    sim_neg = jnp.mean(jnp.sum(outs["descriptor"] * descr_n, -1))
    return loss, {"loss": loss, "segloss": segloss, "recloss": recloss,
                  "kld": kld, "simloss": simloss,
                  "sim_pos": sim_pos, "sim_neg": sim_neg}
