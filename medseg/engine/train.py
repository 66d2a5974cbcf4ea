"""Supervised training engine: jitted step + loop with periodic validation.

Capability contract: the reference ``train`` loop
(`/root/reference/unetr_segmentation_3d.py:211-268`) — per step: forward,
DiceCE, backward, AdamW update; every ``eval_num`` steps run validation and
save the best-mean-Dice checkpoint.

TPU-native differences:
- the whole step (fwd + bwd + optimizer) is ONE jitted XLA program with the
  train state donated (no reallocation churn in HBM);
- batches arrive sharded over the mesh data axis; XLA inserts the gradient
  all-reduce over ICI (see medseg/parallel/mesh.py);
- loss is computed in fp32 even when activations are bf16.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator

import jax
import jax.numpy as jnp

from medseg.engine.state import TrainState
from medseg.ops.losses import dice_ce_loss


def make_train_step(
    model,
    *,
    task: str = "ct",
    donate: bool = True,
    device_augment: bool = False,
) -> Callable[[TrainState, dict], tuple[TrainState, jax.Array]]:
    """Build the jitted supervised train step.

    ``task="ct"`` -> DiceCE(softmax, one-hot target) per
    `unetr_segmentation_3d.py:404`; ``task="mri"`` -> DiceCE(sigmoid,
    multi-channel target) per `:480`.

    ``device_augment=True`` runs the reference's random flip/rot90/intensity
    chain ON DEVICE inside this same program (medseg/ops/augment.py) with
    per-sample keys from the train state's PRNG — use with host augmentations
    disabled (`pipelines.train_transforms(..., augment=False)`).
    """
    softmax = task == "ct"

    def loss_fn(params, image, label):
        logits = model.apply(
            params, image, return_encoder_features=False, deterministic=False
        )
        # CT path on TPU: fused Pallas DiceCE (kernels/loss_of.py) — same
        # value/grad as dice_ce_loss, but the class dim rides sublanes
        # instead of a 14-wide minor lane tile; the jnp chain's ~8 channel-
        # minor full-volume passes cost ~38 ms/step at 4x96^3x14
        # (benchmarks/trace_train.py). MEDSEG_FUSED_LOSS=0 restores jnp.
        import os

        from medseg.kernels.loss_of import dice_ce_fused, fused_loss_supported

        if (
            fused_loss_supported(logits.shape, task)
            and jax.default_backend() == "tpu"
            and os.environ.get("MEDSEG_FUSED_LOSS", "1") == "1"
        ):
            return dice_ce_fused(logits, label)
        return dice_ce_loss(
            logits,
            label,
            softmax=softmax,
            sigmoid=not softmax,
            to_onehot_y=softmax,
        )

    def step(state: TrainState, image: jax.Array, label: jax.Array):
        if device_augment:
            from medseg.ops.augment import augment_batch

            aug_key, new_rng = jax.random.split(state.rng)
            lab4 = label if label.ndim == 5 else label[..., None]
            image, lab4 = augment_batch(aug_key, image, lab4.astype(image.dtype))
            label = lab4 if label.ndim == 5 else lab4[..., 0].astype(label.dtype)
            state = state.replace(rng=new_rng)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, image, label)
        return state.apply_gradients(grads), loss

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def step_on_batch(state: TrainState, batch: dict):
        """Accept a loader batch dict; metadata (paths, affines) stays host-side."""
        return jitted(state, batch["image"], batch["label"])

    return step_on_batch


class TrainLoop:
    """Step loop with periodic validation and best-checkpoint selection.

    Mirrors the reference driver (`unetr_segmentation_3d.py:599-621`):
    run until ``max_iterations`` global steps, validating every ``eval_num``
    steps, keeping the best mean-Dice checkpoint.
    """

    def __init__(
        self,
        train_step: Callable,
        *,
        max_iterations: int,
        eval_num: int,
        validator: Callable[[TrainState], float] | None = None,
        checkpointer=None,
        log_fn: Callable[[str], None] = print,
        save_latest_every: int | None = None,
        sync_every: int = 1,
        progress: Callable[[int, int, float], None] | None = None,
    ) -> None:
        self.train_step = train_step
        self.max_iterations = max_iterations
        self.eval_num = eval_num
        self.validator = validator
        self.checkpointer = checkpointer
        self.log_fn = log_fn
        # elastic-recovery cadence: periodically persist the FULL train state
        # under "latest" regardless of metric (reference only saves on metric
        # improvement and loses optimizer state; SURVEY.md §5)
        self.save_latest_every = save_latest_every
        # ``sync_every=1`` blocks on the loss every step (honest per-step
        # timing, the reference's behavior at `unetr_segmentation_3d.py:222`).
        # ``sync_every=N>1`` leaves N steps in flight so XLA dispatch, host
        # data loading, and H2D overlap compute — the production setting.
        self.sync_every = max(1, int(sync_every))
        # live step readout hook (reference tqdm at seg:214-216,228-230):
        # called as progress(step, max_iterations, last_synced_loss)
        self.progress = progress
        self.loss_history: list[float] = []
        self.metric_history: list[float] = []
        self.best_metric: float = -1.0
        self.best_step: int = -1
        self.running_time: float = 0.0

    def run(self, state: TrainState, batches: Iterator[dict]) -> TrainState:
        global_step = int(state.step)
        pending: list = []  # device losses not yet fetched (async dispatch)

        def drain() -> None:
            while pending:
                self.loss_history.append(float(pending.pop(0)))

        while global_step < self.max_iterations:
            try:
                batch = next(batches)
            except StopIteration:
                break
            t0 = time.perf_counter()
            state, loss = self.train_step(state, batch)
            pending.append(loss)
            global_step += 1
            if (
                len(pending) >= self.sync_every
                or global_step == self.max_iterations
                or global_step % self.eval_num == 0
            ):
                drain()  # blocks on the oldest in-flight step
            self.running_time += time.perf_counter() - t0
            if self.progress is not None:
                last = self.loss_history[-1] if self.loss_history else float("nan")
                self.progress(global_step, self.max_iterations, last)
            if (
                self.save_latest_every
                and self.checkpointer is not None
                and global_step % self.save_latest_every == 0
            ):
                self.checkpointer.save(state, name="latest")
            if (
                global_step % self.eval_num == 0 or global_step == self.max_iterations
            ) and self.validator is not None:
                metric = float(self.validator(state))
                self.metric_history.append(metric)
                if metric > self.best_metric:
                    self.best_metric = metric
                    self.best_step = global_step
                    if self.checkpointer is not None:
                        self.checkpointer.save(state, metrics={"dice": metric})
                    self.log_fn(
                        f"Model Was Saved ! Best Dice: {self.best_metric:.5f} "
                        f"at step {self.best_step}; train time {self.running_time:.1f}s"
                    )
                else:
                    self.log_fn(
                        f"Model Not Saved ! Best Dice: {self.best_metric:.5f} "
                        f"Current: {metric:.5f} at step {global_step}"
                    )
        if self.checkpointer is not None:
            self.checkpointer.wait()  # commit any in-flight async save
        return state
