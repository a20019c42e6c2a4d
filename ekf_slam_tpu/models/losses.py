"""CALC2 training losses ("CALC 2.0"/calc2.py:271-318, utils.py:278-307).

total = segloss + 1e-4 * kld + 1e-4 * recloss + simloss   (calc2.py:315-318)
"""

from __future__ import annotations

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
               margin: float = 0.5):
    """The 4-term CALC2 objective; returns (loss, metrics dict)."""
    descr_n = hard_negative_mine(outs["descriptor"])
    simloss = triplet_loss(outs["descriptor"], outs_warp_descr, descr_n,
                           margin)
    segloss = seg_loss(outs["seg"], labels_onehot, class_weights)
    recloss = recon_loss(outs["rec"], images)
    kld = kld_loss(outs["mu"], outs["log_sig_sq"])
    loss = segloss + 1e-4 * kld + 1e-4 * recloss + simloss
    return loss, {"loss": loss, "segloss": segloss, "recloss": recloss,
                  "kld": kld, "simloss": simloss}
