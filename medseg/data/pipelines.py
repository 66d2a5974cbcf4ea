"""Complete transform pipelines, assembled exactly as the reference composes
them.

Sources (order of transforms preserved transform-for-transform):
- CT segmentation train: `/root/reference/unetr_segmentation_3d.py:322-378`
- CT segmentation val: `:379-400`
- MRI/BraTS segmentation train: `:408-459` (note NormalizeIntensity comes
  AFTER the augmentations in the train chain, matching `:456`)
- MRI/BraTS segmentation val: `:460-476`
- CT pretraining: `/root/reference/unetr_ranking_pretraining_3d.py:346-397`
  (RandSpatialCropSamples with num_samples=batch_size replaces pos/neg crop)
- MRI pretraining: `:400-444`

Each factory takes an ``np.random.Generator`` for the random suffix so full
pipelines are reproducible from a seed. ``ToTensord`` has no equivalent here
— batches stay numpy until the loader/device boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

from medseg.config import DataConfig
from medseg.data import transforms as T
from medseg.data.sampling import (
    rand_crop_by_pos_neg_label,
    rand_flip,
    rand_rotate90,
    rand_shift_intensity,
    rand_spatial_crop_samples,
)


def _augmentations(cfg: DataConfig, rng: np.random.Generator):
    """The shared augmentation tail: 3 axis flips, rot90, intensity shift."""
    return [
        partial(rand_flip, axis=0, prob=cfg.flip_prob, rng=rng),
        partial(rand_flip, axis=1, prob=cfg.flip_prob, rng=rng),
        partial(rand_flip, axis=2, prob=cfg.flip_prob, rng=rng),
        partial(rand_rotate90, prob=cfg.rot90_prob, max_k=3, rng=rng),
        partial(
            rand_shift_intensity, offsets=cfg.shift_offset, prob=cfg.shift_prob, rng=rng
        ),
    ]


def _apply_each(crops: list[dict], fns) -> list[dict]:
    for fn in fns:
        crops = [fn(c) for c in crops]
    return crops


def _ct_deterministic(cfg: DataConfig):
    steps = [
        T.load,
        T.ensure_channel,
        partial(T.respace, pixdim=cfg.spacing),
        T.orient_ras,
        partial(
            T.scale_intensity_range,
            a_min=cfg.intensity_window[0],
            a_max=cfg.intensity_window[1],
        ),
    ]
    if cfg.crop_foreground:
        steps.append(T.crop_foreground)
    return steps


def _mri_deterministic(cfg: DataConfig):
    return [
        T.load,
        T.ensure_channel,
        T.brats_to_multichannel,
        partial(T.respace, pixdim=cfg.spacing),
        T.orient_ras,
    ]


def ct_train_transforms(
    cfg: DataConfig, rng: np.random.Generator, augment: bool = True
) -> T.Compose:
    crop = partial(
        rand_crop_by_pos_neg_label,
        spatial_size=(cfg.crop_size,) * 3,
        num_samples=cfg.num_crop_samples,
        pos=cfg.pos_neg_ratio[0],
        neg=cfg.pos_neg_ratio[1],
        image_threshold=0.0,
        rng=rng,
    )
    augs = _augmentations(cfg, rng) if augment else []
    return T.Compose(
        _ct_deterministic(cfg) + [lambda s: _apply_each(crop(s), augs)]
    )


def ct_val_transforms(cfg: DataConfig) -> T.Compose:
    return T.Compose(_ct_deterministic(cfg))


def mri_train_transforms(
    cfg: DataConfig, rng: np.random.Generator, augment: bool = True
) -> T.Compose:
    crop = partial(
        rand_crop_by_pos_neg_label,
        spatial_size=(cfg.crop_size,) * 3,
        num_samples=cfg.num_crop_samples,
        pos=cfg.pos_neg_ratio[0],
        neg=cfg.pos_neg_ratio[1],
        image_threshold=0.0,
        rng=rng,
    )
    augs = (_augmentations(cfg, rng) if augment else []) + [T.normalize_intensity]  # normalize LAST (:456)
    return T.Compose(
        _mri_deterministic(cfg) + [lambda s: _apply_each(crop(s), augs)]
    )


def mri_val_transforms(cfg: DataConfig) -> T.Compose:
    return T.Compose(_mri_deterministic(cfg) + [T.normalize_intensity])


def pretrain_transforms(
    cfg: DataConfig, rng: np.random.Generator, num_samples: int = 2
) -> T.Compose:
    """The pretraining chain: deterministic prefix per task, then
    ``num_samples`` random spatial crops of the SAME volume (the "pair of
    transforms", pre :365-369), then independent augmentations per crop."""
    crop = partial(
        rand_spatial_crop_samples,
        roi_size=(cfg.crop_size,) * 3,
        num_samples=num_samples,
        rng=rng,
    )
    if cfg.task == "ct":
        prefix = _ct_deterministic(cfg)
        augs = _augmentations(cfg, rng)
    else:
        prefix = _mri_deterministic(cfg)
        augs = _augmentations(cfg, rng) + [T.normalize_intensity]
    return T.Compose(prefix + [lambda s: _apply_each(crop(s), augs)])


def train_transforms(
    cfg: DataConfig, rng: np.random.Generator, augment: bool = True
) -> T.Compose:
    """``augment=False`` leaves random flips/rot/shift to the device-side
    pipeline (medseg/ops/augment.py via ``make_train_step(device_augment=True)``)."""
    return (
        ct_train_transforms(cfg, rng, augment)
        if cfg.task == "ct"
        else mri_train_transforms(cfg, rng, augment)
    )


def val_transforms(cfg: DataConfig) -> T.Compose:
    return ct_val_transforms(cfg) if cfg.task == "ct" else mri_val_transforms(cfg)


def ct_val_transforms_device(cfg: DataConfig) -> T.Compose:
    """CT validation preprocessing with the hot stages ON DEVICE (the
    north-star device-side preprocessing path): host NIfTI decode +
    channel handling, then device respacing with the intensity window FUSED
    into the resample epilogue, device RAS orientation, device foreground
    crop. Intensity windowing commutes with orientation (elementwise), so
    the result matches the host chain transform-for-transform
    (tests/test_resample_device.py::test_device_val_pipeline_matches_host).
    The output ``image`` is a device array ready for sliding-window
    inference — no host resample, no extra H2D copy.
    """
    from medseg.ops import resample as R

    steps = [
        T.load,
        T.ensure_channel,
        partial(
            R.respace_device,
            pixdim=cfg.spacing,
            window=(*cfg.intensity_window, 0.0, 1.0, True),
        ),
        R.orient_ras_device,
    ]
    if cfg.crop_foreground:
        steps.append(R.crop_foreground_device)
    return T.Compose(steps)


def mri_val_transforms_device(cfg: DataConfig) -> T.Compose:
    """MRI/BraTS validation preprocessing on device (z-score normalization
    runs as jnp on the resampled device tensor)."""
    from medseg.ops import resample as R
    from medseg.ops.post import normalize_intensity_device

    return T.Compose(
        [
            T.load,
            T.ensure_channel,
            T.brats_to_multichannel,
            partial(R.respace_device, pixdim=cfg.spacing),
            R.orient_ras_device,
            normalize_intensity_device,
        ]
    )


def val_transforms_device(cfg: DataConfig) -> T.Compose:
    return (
        ct_val_transforms_device(cfg)
        if cfg.task == "ct"
        else mri_val_transforms_device(cfg)
    )
