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


def _render_voronoi(seeds: jnp.ndarray, cell_cls: jnp.ndarray,
                    palette: jnp.ndarray, hw, key: jax.Array):
    """Render (B, H, W, 3) images + one-hot labels from per-scene Voronoi
    seeds (B, N, 2), per-cell classes (B, N) and a shared palette."""
    h, w = hw
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

    return jax.vmap(one)(seeds, cell_cls,
                         jax.random.split(key, seeds.shape[0]))


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
    return _render_voronoi(seeds, cell_cls, palette, hw, kn)


def aliased_places(key: jax.Array, n_places: int, group: int = 4,
                   hw=(192, 256), num_cells: int = 48,
                   jitter_px: float = 0.5, distinct_cells: int = 2):
    """Perceptually-ALIASED place set: `n_places` scenes drawn from
    `n_places // group` structural archetypes, `group` places each.

    Places within an archetype share the seed layout and class map up to
    a sub-pixel seed jitter plus `distinct_cells` reassigned cells — the
    repeated-architecture regime (identical corridors/facades) that makes
    real place recognition hard. Defaults are calibrated so same-archetype
    pairs sit at ~0.8 zero-mean pixel cosine (near-duplicates) while
    cross-archetype pairs sit at ~0.1 (tests/test_data.py pins both). Independent scenes (synthetic_batch) are
    mutually distinct enough that an UNTRAINED width-16 CALC2 already
    ranks them at PR-AUC 0.977 (docs/CALC2_RUN.md saturation note); here
    every query faces `group-1` near-duplicate impostors, so retrieval
    must encode the small distinguishing structure, not the archetype.

    Returns (images (n_places, H, W, 3), labels one-hot,
    archetype_id (n_places,) int32) ordered archetype-major.
    """
    assert n_places % group == 0, (n_places, group)
    n_arch = n_places // group
    h, w = hw
    ka, kcls, kcol, kj, kd, kdc, kn = jax.random.split(key, 7)
    base_seeds = (jax.random.uniform(ka, (n_arch, num_cells, 2))
                  * jnp.array([h, w]))
    base_cls = jax.random.randint(kcls, (n_arch, num_cells), 0, N_CLASSES)
    palette = jax.random.uniform(kcol, (N_CLASSES, 3), minval=0.1,
                                 maxval=0.9)
    # Per-place perturbations of the archetype.
    seeds = (jnp.repeat(base_seeds, group, axis=0)
             + jitter_px * jax.random.normal(
                 kj, (n_places, num_cells, 2)))
    # Reassign `distinct_cells` cells per place (the place identity).
    which = jax.vmap(lambda k: jax.random.choice(
        k, num_cells, (distinct_cells,), replace=False))(
        jax.random.split(kd, n_places))                  # (P, distinct)
    new_cls = jax.random.randint(kdc, (n_places, distinct_cells),
                                 0, N_CLASSES)
    cell_cls = jnp.repeat(base_cls, group, axis=0)
    cell_cls = jax.vmap(lambda c, wh, nc: c.at[wh].set(nc))(
        cell_cls, which, new_cls)
    imgs, labels = _render_voronoi(seeds, cell_cls, palette, hw, kn)
    arch_id = jnp.repeat(jnp.arange(n_arch, dtype=jnp.int32), group)
    return imgs, labels, arch_id


def class_weights(labels_onehot: jnp.ndarray) -> jnp.ndarray:
    """Inverse-frequency class weights — the running-mean scheme of
    gen_tfrecords.py:104-105,162-167 collapsed to one batch."""
    freq = jnp.mean(labels_onehot, axis=(0, 1, 2))
    return 1.0 / jnp.maximum(freq, 1e-3)


def aliased_batches(key: jax.Array, batch: int, group: int = 4,
                    hw=(192, 256), **alias_kwargs):
    """Infinite generator of archetype-GROUPED training batches:
    (images, labels_onehot) with each batch drawn as `batch // group`
    fresh archetypes x `group` sibling places (aliased_places), ordered
    archetype-major.

    Purpose: make in-batch hard-negative mining (models/losses.py
    hard_negative_mine, the utils.py:278-307 analog) actually SEE
    near-duplicate impostors. Training on independent scenes
    (synthetic_batch) leaves the hardest in-batch negative far away, so
    the triplet term never exercises sibling separation — the measured
    round-2 regression where training made plain retrieval WORSE under
    perceptual aliasing (docs/CALC2_RUN.md r2run4: PR-AUC 0.716
    untrained -> 0.688 trained at aliasing=4). With grouped batches the
    hardest negative is almost always a same-archetype sibling, and the
    margin objective optimizes exactly the aliased-retrieval criterion.
    """
    assert batch % group == 0, (batch, group)
    while True:
        key, sub = jax.random.split(key)
        imgs, labels, _ = aliased_places(sub, batch, group=group, hw=hw,
                                         **alias_kwargs)
        yield imgs, labels
