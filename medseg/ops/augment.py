"""Device-side augmentation pipeline: jit-able, vmapped, per-sample PRNG keys.

The reference applies its random augmentations per sample on host CPU inside
DataLoader workers (`/root/reference/unetr_segmentation_3d.py:351-375`:
RandFlipd x3, RandRotate90d, RandShiftIntensityd). medseg's host path
(medseg/data/sampling.py) reproduces that; THIS module is the TPU-native
alternative named by the north-star: once crops are on device, the whole
augmentation chain is one fused XLA program — flips/rot90 become gathers
fused with the intensity ops, vmapped over the batch with independent
per-sample keys, overlapping host preprocessing entirely.

Semantics match the host versions (same probabilities/ranges):
- flip each spatial axis with p=0.1
- rot90 k in 1..3 in the (0, 1) plane with p=0.1
- intensity shift U(-0.1, 0.1) with p=0.5 (image only)

Use `augment_batch(key, image, label)` inside the train step (one key per
step; keys are split per sample).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp


def _maybe_flip(key: jax.Array, img: jax.Array, lab: jax.Array, axis: int, prob: float):
    do = jax.random.uniform(key) < prob
    return (
        jnp.where(do, jnp.flip(img, axis=axis), img),
        jnp.where(do, jnp.flip(lab, axis=axis), lab),
    )


def _maybe_rot90(key: jax.Array, img: jax.Array, lab: jax.Array, prob: float, max_k: int):
    kp, kk = jax.random.split(key)
    do = jax.random.uniform(kp) < prob
    k = jax.random.randint(kk, (), 1, max_k + 1)

    def rotk(x):
        # rot90 in the (0,1) plane, k in {0..3}, as a lax.switch of gathers
        return jax.lax.switch(
            jnp.where(do, k, 0),
            [
                lambda a: a,
                lambda a: jnp.rot90(a, 1, axes=(0, 1)),
                lambda a: jnp.rot90(a, 2, axes=(0, 1)),
                lambda a: jnp.rot90(a, 3, axes=(0, 1)),
            ],
            x,
        )

    return rotk(img), rotk(lab)


def _maybe_shift(key: jax.Array, img: jax.Array, offsets: float, prob: float):
    kp, ks = jax.random.split(key)
    do = jax.random.uniform(kp) < prob
    shift = jax.random.uniform(ks, (), minval=-offsets, maxval=offsets)
    return img + jnp.where(do, shift, 0.0).astype(img.dtype)


def _augment_one(
    key: jax.Array,
    image: jax.Array,  # (D, H, W, C)
    label: jax.Array,  # (D, H, W[, C])
    *,
    flip_prob: float,
    rot_prob: float,
    max_k: int,
    shift_offsets: float,
    shift_prob: float,
):
    keys = jax.random.split(key, 5)
    for axis, k in zip((0, 1, 2), keys[:3]):
        image, label = _maybe_flip(k, image, label, axis, flip_prob)
    image, label = _maybe_rot90(keys[3], image, label, rot_prob, max_k)
    image = _maybe_shift(keys[4], image, shift_offsets, shift_prob)
    return image, label


@functools.partial(
    jax.jit,
    static_argnames=("flip_prob", "rot_prob", "max_k", "shift_offsets", "shift_prob"),
)
def augment_batch(
    key: jax.Array,
    image: jax.Array,  # (B, D, H, W, C)
    label: jax.Array,  # (B, D, H, W[, C])
    *,
    flip_prob: float = 0.1,
    rot_prob: float = 0.1,
    max_k: int = 3,
    shift_offsets: float = 0.1,
    shift_prob: float = 0.5,
):
    """Apply the reference augmentation chain on device, per-sample keys.

    rot90 requires cubic (D == H) crops (the reference's crops are cubic).
    """
    keys = jax.random.split(key, image.shape[0])
    fn = functools.partial(
        _augment_one,
        flip_prob=flip_prob,
        rot_prob=rot_prob,
        max_k=max_k,
        shift_offsets=shift_offsets,
        shift_prob=shift_prob,
    )
    return jax.vmap(fn)(keys, image, label)


def scale_intensity_range_device(
    image: jax.Array,
    a_min: float = -175.0,
    a_max: float = 250.0,
    b_min: float = 0.0,
    b_max: float = 1.0,
    clip: bool = True,
) -> jax.Array:
    """Device twin of ScaleIntensityRanged — fuses into adjacent device ops."""
    scale = (b_max - b_min) / (a_max - a_min)
    y = (image - a_min) * scale + b_min
    return jnp.clip(y, b_min, b_max) if clip else y
