"""Ranking self-supervised pretraining engine.

Capability contract: `/root/reference/unetr_ranking_pretraining_3d.py:238-296`
(train loop) and `:506-611` (two-stage feat -> recon driver with the
convergence rule at `:542-551`).

Per step the reference: forwards a batch of 4 (2 volumes x 2 augmentations),
takes enc4 features ("feat" stage) or frozen-encoder decoder logits ("recon"
stage), builds 576 slice triplets on one axis, and applies BTLoss or
ContrastiveLoss which ALSO run backward + optimizer internally. Here the step
is one pure jitted program per (axis, stage): forward -> slice gather ->
cosine matrix -> loss -> grad -> AdamW update. Slice indices are sampled on
host (same rule: one shared random offset per partition) and passed as traced
ints, so no recompilation across steps.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from medseg.engine.state import TrainState
from medseg.ops.ranking import (
    bt_ranking_loss,
    gather_partition_slices,
    info_nce_loss,
    pairwise_channel_cosine,
    sample_partition_indices,
)


def make_pretrain_step(
    model,
    *,
    update_arc: str,  # "feat" | "recon"
    loss_type: str,  # "ranking" | "contrastive"
    num_partitions: int,
    temperature: float,
    donate: bool = True,
) -> Callable:
    """Build a jitted pretraining step; ``axis`` is static (3 compilations,
    one per slicing dimension — the reference cycles axes at
    `unetr_ranking_pretraining_3d.py:241`)."""
    if update_arc not in ("feat", "recon"):
        raise ValueError(update_arc)
    loss_impl = bt_ranking_loss if loss_type == "ranking" else info_nce_loss

    def loss_fn(params, images, slice_indices, axis):
        enc4, logits = model.apply(
            params, images, freeze_encoder=(update_arc == "recon")
        )
        feats = enc4 if update_arc == "feat" else logits
        slices = gather_partition_slices(feats, slice_indices, axis)
        cos = pairwise_channel_cosine(slices)
        return loss_impl(cos, num_partitions, temperature)

    @partial(jax.jit, static_argnames=("axis",), donate_argnums=(0,) if donate else ())
    def step(state: TrainState, images: jax.Array, slice_indices: jax.Array, *, axis: int):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, images, slice_indices, axis
        )
        return state.apply_gradients(grads), loss

    return step


def feature_dim_for_axis(
    crop_size: int, update_arc: str, axis: int, patch_size: int = 16
) -> int:
    """Spatial extent of the sliced axis: enc4 is at 1/8 resolution
    (`/root/reference/unetr.py:123-134`), decoder logits at full resolution."""
    return crop_size // 8 if update_arc == "feat" else crop_size


class ConvergenceTracker:
    """Reference convergence rule (`unetr_ranking_pretraining_3d.py:542-551`):
    stop when |mean(last-10 epoch losses) - latest| < rtol * mean, or at
    ``max_iterations``."""

    def __init__(self, rtol: float = 1e-2, window: int = 10, max_iterations: int = 250):
        self.rtol = rtol
        self.window = window
        self.max_iterations = max_iterations
        self.losses: list[float] = []
        self.iterations = 0

    def update(self, epoch_loss: float) -> None:
        self.losses.append(float(epoch_loss))
        self.iterations += 1

    @property
    def converged(self) -> bool:
        if self.iterations >= self.max_iterations:
            return True
        if len(self.losses) < self.window:
            return False
        recent = np.asarray(self.losses[-self.window :])
        mean = float(recent.mean())
        if mean == 0.0:
            return True
        return abs(mean - self.losses[-1]) < self.rtol * abs(mean)


def pretrain_epoch(
    step_fn: Callable,
    state: TrainState,
    batches,
    *,
    update_arc: str,
    crop_size: int,
    num_partitions: int,
    rng: np.random.Generator,
    axes: tuple[int, ...] = (0, 1, 2),
) -> tuple[TrainState, float]:
    """One pass over the loader per slicing axis (reference cycles
    dims [2, 3, 4] == spatial axes 0/1/2 at `unetr_ranking_pretraining_3d.py:241`).

    Returns the new state and the mean per-axis epoch loss.
    """
    epoch_losses = []
    for axis in axes:
        dim = feature_dim_for_axis(crop_size, update_arc, axis)
        axis_loss, n = 0.0, 0
        for batch in batches(axis):
            images = batch["image"]
            if images.shape[0] != 4:
                # reference guard: need a transform pair on a volume pair
                # (`unetr_ranking_pretraining_3d.py:251-253`)
                continue
            idx = jnp.asarray(sample_partition_indices(rng, dim, num_partitions))
            state, loss = step_fn(state, images, idx, axis=axis)
            axis_loss += float(loss)
            n += 1
        if n:
            epoch_losses.append(axis_loss / n)
    return state, float(np.mean(epoch_losses)) if epoch_losses else 0.0
