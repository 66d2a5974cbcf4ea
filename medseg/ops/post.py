"""Post-transforms and label converters (pure jnp).

Contracts:
- ``AsDiscrete(argmax=True, to_onehot=True, n)`` / ``AsDiscrete(to_onehot=True, n)``
  (`/root/reference/unetr_segmentation_3d.py:405-406`).
- ``Activations(sigmoid=True)`` + ``AsDiscrete(threshold_values=True)`` for the
  BraTS path (`/root/reference/unetr_segmentation_3d.py:482`).
- ``ConvertToMultiChannelBasedOnBratsClassesd``: BraTS labels {0,1,2,3} -> 4
  binary channels [background, TC=2|3, WT=1|2|3, ET=3]
  (`/root/reference/unetr_segmentation_3d.py:65-93`).
- ``ConvertFromMultiChannelToRGB``: collapse channels to an int-coded map with
  priority WT=1, TC=2, ET=3 (`/root/reference/unetr_segmentation_3d.py:95-101`).

All arrays channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medseg.ops.losses import to_onehot


def argmax_onehot(logits: jax.Array, num_classes: int) -> jax.Array:
    """``AsDiscrete(argmax=True, to_onehot=True)``: logits -> one-hot prediction."""
    return jax.nn.one_hot(jnp.argmax(logits, axis=-1), num_classes, dtype=jnp.float32)


def sigmoid_threshold(logits: jax.Array, threshold: float = 0.5) -> jax.Array:
    """``Activations(sigmoid=True)`` + ``AsDiscrete(threshold_values=True)``."""
    return (jax.nn.sigmoid(logits) >= threshold).astype(jnp.float32)


def convert_brats_labels_to_multichannel(label: jax.Array) -> jax.Array:
    """BraTS label map -> 4 binary channels [background, TC, WT, ET].

    Matches the reference converter (`unetr_segmentation_3d.py:65-93`):
    TC (tumor core) = labels 2 or 3, WT (whole tumor) = 1, 2 or 3,
    ET (enhancing tumor) = label 3, plus an explicit background channel.
    Accepts (..., ) or (..., 1) label-index arrays; returns (..., 4) float.
    """
    if label.shape[-1] == 1:
        label = label[..., 0]
    background = (label == 0)
    tc = jnp.logical_or(label == 2, label == 3)
    wt = jnp.logical_or(jnp.logical_or(label == 1, label == 2), label == 3)
    et = label == 3
    return jnp.stack([background, tc, wt, et], axis=-1).astype(jnp.float32)


def multichannel_to_label_map(mask: jax.Array) -> jax.Array:
    """4-channel [bg, TC, WT, ET] -> int map, priority WT=1 < TC=2 < ET=3.

    Matches ``ConvertFromMultiChannelToRGB`` (`unetr_segmentation_3d.py:95-101`):
    later assignments overwrite earlier ones (WT first, then TC, then ET).
    """
    out = jnp.zeros(mask.shape[:-1], dtype=jnp.int32)
    out = jnp.where(mask[..., 2] > 0, 1, out)  # WT
    out = jnp.where(mask[..., 1] > 0, 2, out)  # TC
    out = jnp.where(mask[..., 3] > 0, 3, out)  # ET
    return out


@jax.jit
def _znorm_device(x: jax.Array) -> jax.Array:
    """z-score over nonzero voxels of one channel (NormalizeIntensityd
    contract, `unetr_segmentation_3d.py:456`) — device twin of
    ``transforms._znorm(nonzero=True)``."""
    mask = x != 0
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask, x, 0.0)) / n
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / n
    std = jnp.sqrt(var)
    std = jnp.where(std == 0, 1.0, std)
    y = jnp.where(mask, (x - mean) / std, x)
    return jnp.where(jnp.any(mask), y, x)


def normalize_intensity_device(sample: dict, keys=("image",)) -> dict:
    """Device NormalizeIntensityd(nonzero=True, channel_wise=True)."""
    out = dict(sample)
    for key in keys:
        img = jnp.asarray(out[key], jnp.float32)
        out[key] = jnp.stack(
            [_znorm_device(img[..., c]) for c in range(img.shape[-1])], axis=-1
        )
    return out


__all__ = [
    "argmax_onehot",
    "to_onehot",
    "sigmoid_threshold",
    "convert_brats_labels_to_multichannel",
    "multichannel_to_label_map",
    "normalize_intensity_device",
]
