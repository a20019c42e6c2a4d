"""Synthetic segmentation data for CALC2-class training.

The reference's pipeline ("CALC 2.0"/dataset/gen_tfrecords.py:41-167) turns
COCO-Stuff into 320x320 image/13-class-mask tfrecords plus inverse class
frequency weights (loss_weights.txt). COCO is not bundled (SURVEY.md §2.9),
so this module generates structured random scenes — piecewise-constant
class regions from random Voronoi cells with class-correlated colors — which
exercise every term of the CALC2 objective (segmentation CE needs
class-structured labels; reconstruction and triplet losses need images whose
appearance correlates with layout).

A real-data path can drop in by producing the same (images, labels_onehot)
batches; see data/records.py for the file-backed loader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ekf_slam_tpu.models.vss import N_CLASSES


def synthetic_batch(key: jax.Array, batch: int, hw=(192, 256),
                    num_cells: int = 24):
    """Returns (images (B,H,W,3) in [0,1], labels (B,H,W,13) one-hot)."""
    h, w = hw
    kc, kcls, kcol, kn = jax.random.split(key, 4)
    # Voronoi seeds: (B, num_cells, 2) in pixel coords, a class per cell.
    seeds = jax.random.uniform(kc, (batch, num_cells, 2)) * jnp.array([h, w])
    cell_cls = jax.random.randint(kcls, (batch, num_cells), 0, N_CLASSES)
    # Class-correlated palette, shared across the batch, plus per-cell jitter.
    palette = jax.random.uniform(kcol, (N_CLASSES, 3), minval=0.1, maxval=0.9)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    grid = jnp.stack(jnp.broadcast_arrays(yy, xx), axis=-1)      # (H, W, 2)

    def one(seed_pts, classes, k):
        d2 = jnp.sum(
            (grid[:, :, None, :] - seed_pts[None, None, :, :]) ** 2, axis=-1)
        cell = jnp.argmin(d2, axis=-1)                           # (H, W)
        cls = classes[cell]                                      # (H, W)
        img = palette[cls]                                       # (H, W, 3)
        img = img + 0.05 * jax.random.normal(k, img.shape)
        return jnp.clip(img, 0.0, 1.0), jax.nn.one_hot(cls, N_CLASSES)

    imgs, labels = jax.vmap(one)(seeds, cell_cls,
                                 jax.random.split(kn, batch))
    return imgs, labels


def class_weights(labels_onehot: jnp.ndarray) -> jnp.ndarray:
    """Inverse-frequency class weights — the running-mean scheme of
    gen_tfrecords.py:104-105,162-167 collapsed to one batch."""
    freq = jnp.mean(labels_onehot, axis=(0, 1, 2))
    return 1.0 / jnp.maximum(freq, 1e-3)
