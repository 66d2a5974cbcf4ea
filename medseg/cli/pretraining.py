"""Ranking self-supervised pretraining CLI — reference-compatible driver.

Usage (same positional arguments as
`/root/reference/unetr_ranking_pretraining_3d.py:300-314`):

    python -m medseg.cli.pretraining DATA_DIR DATASET_NAME ROOT_DIR N_CLASSES \
        LEARNING_RATE TEMPERATURE LOSS [--folds K] [--max-iterations N] [--bf16]

Per fold (reference `:506-611`): STAGE 1 "feat" pretrains the encoder on
enc4-latent slice triplets until convergence, then STAGE 2 "recon" pretrains
the decoder (frozen encoder) the same way; each stage saves checkpoints on
schedule and plots loss-vs-time.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from medseg.cli.common import (
    apply_overrides,
    build_model,
    device_put_batch,
    fold_datalists,
    resolve_datalist,
)
from medseg.config import preset
from medseg.data.dataset import CacheDataset
from medseg.data.loader import DataLoader
from medseg.data.pipelines import pretrain_transforms
from medseg.engine.checkpoint import CheckpointManager
from medseg.engine.pretrain import (
    ConvergenceTracker,
    feature_dim_for_axis,
    make_pretrain_step,
)
from medseg.engine.state import create_train_state
from medseg.ops.ranking import sample_partition_indices
from medseg.utils.artifacts import RunLogger, plot_loss_vs_time
from medseg.utils.profiling import StepTimer

NUM_PARTITIONS = 4  # reference pre :330
BATCH_VOLUMES = 2  # reference pre :331; x2 crops -> device batch of 4


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir", type=str)
    p.add_argument("dataset_name", type=str)
    p.add_argument("root_dir", type=str)
    p.add_argument("n_classes", type=int)
    p.add_argument("learning_rate", type=float)
    p.add_argument("temperature", type=float)
    p.add_argument("loss", type=str, choices=["ranking", "contrastive"])
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--max-folds", type=int, default=None,
                   help="run only the first K folds (debug/smoke)")
    p.add_argument("--max-iterations", type=int, default=250)
    p.add_argument("--eval-num", type=int, default=10)
    p.add_argument("--rtol", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    # model-size overrides (defaults = the reference's only configuration,
    # seg :501-513); small values make CPU smoke tests feasible
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--feature-size", type=int, default=16)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--mlp-dim", type=int, default=3072)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--no-progress", action="store_true",
                   help="disable the tqdm-style live step/loss readout")
    return p


def run_stage(
    args, cfg, model, state, loader, update_arc: str, out_dir: str, logger: RunLogger
):
    """One pretraining stage (feat or recon) to convergence."""
    step_fn = make_pretrain_step(
        model,
        update_arc=update_arc,
        loss_type=args.loss,
        num_partitions=NUM_PARTITIONS,
        temperature=args.temperature,
    )
    prefix = f"{update_arc}_lr_{args.learning_rate}_temp_{args.temperature}"
    ckpt = CheckpointManager(os.path.join(out_dir, prefix))
    consumed_epochs = 0
    if ckpt.exists():
        state = ckpt.restore(state)
        meta = ckpt.metadata()
        if meta.get("completed"):
            # the stage already CONVERGED in a previous run (loss plateau,
            # possibly with epochs < max_iterations) — re-entering it would
            # train another plateau window and mutate converged weights
            # (round-4 advisor finding; crash-in-recon resume path)
            logger.write(
                f"{update_arc}: stage already completed "
                f"({int(meta.get('epoch', 0))} epochs) — skipping"
            )
            return state
        # resume accounting (reference intent at
        # `unetr_ranking_pretraining_3d.py:539-540`: decrement the remaining
        # stage budget by the work already done — its literal code subtracts
        # a variable that is always 0 there, a quirk PARITY.md documents):
        # seed the tracker with the epochs consumed before the crash so a
        # resumed stage never runs more than max_iterations epochs in total
        consumed_epochs = int(meta.get("epoch", 0))
        logger.write(
            f"{update_arc}: resuming from checkpoint "
            f"(step {int(state.step)}, {consumed_epochs} epochs consumed)"
        )

    tracker = ConvergenceTracker(
        rtol=args.rtol, window=10, max_iterations=args.max_iterations
    )
    tracker.iterations = consumed_epochs
    rng = np.random.default_rng(args.seed)
    epoch_losses: list[float] = []
    epoch_times: list[float] = []
    global_step = int(state.step)
    bar = None
    if not args.no_progress:
        # live step readout mirroring the reference tqdm description
        # (`unetr_ranking_pretraining_3d.py:243-246`)
        from tqdm import tqdm

        bar = tqdm(desc=f"{update_arc} Training (X Steps)", dynamic_ncols=True)
    while not tracker.converged:
        timer = StepTimer()
        axis_losses = []
        # one loader pass per slicing axis (reference pre :241)
        for axis in (0, 1, 2):
            dim = feature_dim_for_axis(cfg.model.crop_size, update_arc, axis)
            axis_loss, n = 0.0, 0
            for batch in loader:
                images = batch["image"]
                if images.shape[0] != 2 * BATCH_VOLUMES:
                    continue  # reference guard pre :251-253
                idx = jnp.asarray(sample_partition_indices(rng, dim, NUM_PARTITIONS))
                with timer:
                    state, loss = step_fn(state, images, idx, axis=axis)
                    loss = float(loss)
                axis_loss += loss
                n += 1
                global_step += 1
                if bar is not None:
                    bar.set_description(
                        f"{update_arc} Training ({global_step} Steps) "
                        f"(loss={loss:2.5f}) (loss time={timer.times[-1]:2.5f})"
                    )
                    bar.update(1)
                if global_step % args.eval_num == 0:
                    ckpt.save(
                        state,
                        metrics={"loss": loss, "epoch": tracker.iterations},
                    )
                    logger.write(
                        f"Model Was Saved At Global Step {global_step} for {update_arc}!"
                    )
            if n:
                axis_losses.append(axis_loss / n)
        epoch_loss = float(np.mean(axis_losses)) if axis_losses else 0.0
        tracker.update(epoch_loss)
        epoch_losses.append(epoch_loss)
        epoch_times.append(timer.total)
        logger.write(
            f"{update_arc} epoch {tracker.iterations}: loss={epoch_loss:.5f} "
            f"time={timer.total:.2f}s"
        )
    if bar is not None:
        bar.close()
    # final save: commit before returning (epoch count keeps the resume
    # accounting correct if a crash lands between stages; the completed flag
    # makes a later resume SKIP this stage instead of re-entering a
    # converged one)
    ckpt.save(
        state, metrics={"epoch": tracker.iterations, "completed": 1}, block=True
    )
    plot_loss_vs_time(
        os.path.join(out_dir, f"{prefix}_loss_vs_time.png"), epoch_losses, epoch_times
    )
    return state


def run_fold(args, cfg, fold_idx: int, train_list: list[dict]):
    out_dir = os.path.join(args.root_dir, f"{args.dataset_name}_{fold_idx}")
    os.makedirs(out_dir, exist_ok=True)
    logger = RunLogger(out_dir, "pretrain")
    logger.write(f"fold {fold_idx}: {len(train_list)} unlabeled volumes")

    model = build_model(args, cfg)
    rng_np = np.random.default_rng(args.seed + fold_idx)
    ds = CacheDataset(
        train_list, transform=pretrain_transforms(cfg.data, rng_np, num_samples=2)
    )
    loader = DataLoader(
        ds,
        batch_size=BATCH_VOLUMES,
        shuffle=True,
        num_workers=cfg.data.num_workers,
        seed=args.seed,
        device_put=device_put_batch,
        drop_last=True,
    )
    crop = cfg.model.crop_size
    sample = jnp.zeros((4, crop, crop, crop, cfg.model.in_channels), jnp.float32)
    state = create_train_state(
        model,
        rng=jax.random.key(args.seed + fold_idx),
        sample_input=sample,
        learning_rate=args.learning_rate,
        weight_decay=1e-5,
    )
    # STAGE 1: encoder latent pretraining (reference pre :527-557)
    state = run_stage(args, cfg, model, state, loader, "feat", out_dir, logger)
    # STAGE 2: decoder pretraining with frozen encoder (pre :570-601)
    state = run_stage(args, cfg, model, state, loader, "recon", out_dir, logger)
    return out_dir


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = apply_overrides(preset(args.dataset_name, args.n_classes), args)
    datalist = resolve_datalist(args.data_dir, args.dataset_name)
    folds = fold_datalists(datalist, args.dataset_name, args.folds, cfg.data.cv_seed)
    out_dirs = []
    if args.max_folds is not None:
        folds = folds[: args.max_folds]
    for fold_idx, (train_list, _val) in enumerate(folds):
        out_dirs.append(run_fold(args, cfg, fold_idx, train_list))
    return out_dirs


if __name__ == "__main__":
    main()
