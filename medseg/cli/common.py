"""Shared CLI plumbing: dataset setup, fold iteration, device placement."""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from medseg.config import DataConfig
from medseg.data.dataset import (
    CacheDataset,
    CrossValidationFolds,
    kfold_split,
    load_decathlon_datalist,
)


def resolve_datalist(data_dir: str, dataset_name: str) -> list[dict]:
    """MSD task dir or custom dataset.json dir, both per the layout the
    reference documents (`unetr_segmentation_3d.py:538-548`)."""
    json_path = os.path.join(data_dir, dataset_name, "dataset.json")
    if not os.path.exists(json_path):
        raise FileNotFoundError(
            f"expected Decathlon-format dataset at {json_path} "
            "(imagesTr/, labelsTr/, dataset.json with a 'training' list)"
        )
    return load_decathlon_datalist(json_path, True, "training")


def fold_datalists(
    datalist: list[dict], dataset_name: str, n_folds: int, seed: int
) -> list[tuple[list[dict], list[dict]]]:
    """Per-fold (train, val) lists. MSD tasks use the seeded CrossValidation
    partition (seg :525-536); custom datasets use contiguous k-fold
    (seg :546-559)."""
    folds = []
    if "Task" in dataset_name:
        cv = CrossValidationFolds(datalist, nfolds=n_folds, seed=seed)
        for f in range(n_folds):
            train = cv.get_datalist([g for g in range(n_folds) if g != f])
            val = cv.get_datalist(f)
            folds.append((train, val))
    else:
        for train_idx, val_idx in kfold_split(len(datalist), n_folds):
            folds.append(
                (
                    [datalist[i] for i in train_idx],
                    [datalist[i] for i in val_idx],
                )
            )
    return folds


def subsample_train(train_list: list[dict], train_size: float) -> list[dict]:
    """Label-budget subsample (seg :577-580, without the reference's bug of
    mutating train_size across folds)."""
    n = min(len(train_list), int(train_size))
    return train_list[:n]


def device_put_batch(batch: dict) -> dict:
    """Move array values to device; drop non-arrays (paths, affines stay host)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jnp.asarray(v)
        else:
            out[k] = v
    return out


def apply_overrides(cfg, args):
    """Apply CLI model-size / data overrides onto the dataset preset."""
    import dataclasses

    model = cfg.model
    data = cfg.data
    crop = args.crop_size if args.crop_size else model.crop_size
    model = dataclasses.replace(
        model,
        crop_size=crop,
        feature_size=args.feature_size,
        hidden_size=args.hidden_size,
        mlp_dim=args.mlp_dim,
        num_heads=args.num_heads,
        num_layers=args.num_layers,
        out_channels=args.n_classes,
    )
    data = dataclasses.replace(data, crop_size=crop, num_workers=args.num_workers)
    return cfg.replace(model=model, data=data)


def build_model(args, cfg, *, remat: bool = True):
    """Construct the UNETR from the (possibly overridden) model config.

    ``remat=True`` checkpoints each block in the backward pass — required to
    fit batch-4 96^3 training in 16GB HBM (inference cost: none)."""
    import jax.numpy as jnp

    from medseg.models.unetr import UNETR

    m = cfg.model
    return UNETR(
        in_channels=m.in_channels,
        out_channels=m.out_channels,
        img_size=(m.crop_size,) * 3,
        feature_size=m.feature_size,
        hidden_size=m.hidden_size,
        mlp_dim=m.mlp_dim,
        num_heads=m.num_heads,
        num_layers=m.num_layers,
        dtype=jnp.bfloat16 if args.bf16 else None,
        remat=remat,
    )


def make_output_dir(root_dir: str, pretrained: str, dataset_name: str, fold: int) -> str:
    """Reference output naming (seg :297-307) with the fold suffix FIXED to
    not accumulate across folds (SURVEY.md §2.1 quirk list, seg :563)."""
    if "ranking" in pretrained:
        root_dir = root_dir + "_pretrained_ranking"
    elif "contrast" in pretrained:
        root_dir = root_dir + "_pretrained_contrast"
    out = os.path.join(root_dir, f"{dataset_name}_{fold}")
    os.makedirs(out, exist_ok=True)
    return out
