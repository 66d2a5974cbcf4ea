"""Supervised segmentation CLI — reference-compatible driver.

Usage (same positional arguments as `/root/reference/unetr_segmentation_3d.py:271-286`):

    python -m medseg.cli.segmentation DATA_DIR DATASET_NAME ROOT_DIR N_CLASSES \
        PRETRAINED MODE TRAIN_SIZE LEARNING_RATE [--folds K] [--max-iterations N] \
        [--eval-num N] [--bf16]

Per fold (reference driver `:561-723`): build loaders, train to
``max_iterations`` with validation every ``eval_num`` steps and best-Dice
checkpointing, then run the all-metrics validation, dump ``.npy`` metric
series, plot the loss/Dice curves, and render slice-overlay PDFs for fold 0.
``MODE="eval"`` skips training and evaluates the best checkpoint.
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
    make_output_dir,
    resolve_datalist,
    subsample_train,
)
from medseg.config import preset
from medseg.data.dataset import CacheDataset
from medseg.data.loader import DataLoader
from medseg.data.pipelines import train_transforms, val_transforms
from medseg.engine.checkpoint import CheckpointManager, load_torch_checkpoint
from medseg.engine.evaluate import Validator
from medseg.engine.state import create_train_state
from medseg.engine.train import TrainLoop, make_train_step
from medseg.ops.post import multichannel_to_label_map
from medseg.ops.sliding_window import SlidingWindowSpec
from medseg.utils.artifacts import (
    RunLogger,
    plot_training_curves,
    save_metric_series,
    save_slice_overlays,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir", type=str)
    p.add_argument("dataset_name", type=str)
    p.add_argument("root_dir", type=str)
    p.add_argument("n_classes", type=int)
    p.add_argument("pretrained", type=str)
    p.add_argument("mode", type=str, choices=["train", "eval"])
    p.add_argument("train_size", type=float)
    p.add_argument("learning_rate", type=float)
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--max-folds", type=int, default=None,
                   help="run only the first K folds (debug/smoke)")
    p.add_argument("--max-iterations", type=int, default=25000)
    p.add_argument("--eval-num", type=int, default=500)
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
    p.add_argument("--batch-size", type=int, default=1,
                   help="volumes per step (crops multiply this; reference uses 1)")
    p.add_argument("--device-augment", action="store_true",
                   help="run flip/rot90/shift augmentations on device inside the train step")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the crop batch over all devices (config 5 path)")
    p.add_argument("--sw-overlap", type=float, default=0.25)
    p.add_argument("--sw-mode", type=str, default="constant", choices=["constant", "gaussian"])
    p.add_argument("--save-latest-every", type=int, default=None,
                   help="persist the full train state under 'latest' every N steps "
                        "(elastic recovery: on restart the freshest of latest/best "
                        "resumes with step+optimizer state intact)")
    p.add_argument("--sync-every", type=int, default=1,
                   help="fetch the loss every N steps (N>1 keeps steps in flight so "
                        "dispatch/loading/H2D overlap compute; 1 = honest per-step timing)")
    p.add_argument("--no-progress", action="store_true",
                   help="disable the tqdm-style live step/loss readout")
    return p


def run_fold(args, cfg, fold_idx, train_list, val_list) -> dict:
    from medseg.parallel.runtime import barrier, process_info, shard_datalist

    rank, world = process_info()
    out_dir = make_output_dir(args.root_dir, args.pretrained, args.dataset_name, fold_idx)
    log_name = f"lr_{args.learning_rate}_train_size_{int(args.train_size)}"
    if world > 1:
        log_name += f"_host{rank}"  # per-host log files on a shared FS
    logger = RunLogger(out_dir, log_name)
    logger.write(f"fold {fold_idx}: {len(train_list)} train / {len(val_list)} val volumes")

    model = build_model(args, cfg)

    # multi-host input sharding: each host loads only its slice of the
    # training datalist (SURVEY.md §5.8 "per-host data sharding"); the val
    # list stays global — eval is one SPMD program every process must run
    train_list_local = shard_datalist(train_list)
    if world > 1:
        logger.write(
            f"host {rank}/{world}: {len(train_list_local)} local train volumes"
        )

    rng_np = np.random.default_rng(args.seed + fold_idx + 1009 * rank)
    train_ds = CacheDataset(
        train_list_local,
        transform=train_transforms(cfg.data, rng_np, augment=not args.device_augment),
    )
    val_ds = CacheDataset(val_list, transform=val_transforms(cfg.data))

    mesh = None
    put = device_put_batch
    if args.data_parallel and jax.device_count() > 1:
        from medseg.parallel.mesh import make_mesh
        from medseg.parallel.runtime import shard_batch_multihost

        # local crops per step; the global batch is world x this
        crops_per_step = args.batch_size * cfg.data.num_crop_samples
        if crops_per_step % len(jax.local_devices()) == 0:
            mesh = make_mesh()
            logger.write(
                f"data-parallel over {jax.device_count()} devices / {world} hosts "
                f"({crops_per_step} local crops/step)"
            )

            def put(batch):
                arrays = {
                    k: v for k, v in batch.items()
                    if isinstance(v, np.ndarray) and v.dtype != object
                }
                # every host must contribute the same local batch at the
                # same step (SPMD) — enforce the full-size contract the
                # drop_last loader below guarantees
                return shard_batch_multihost(
                    mesh, arrays,
                    expected_local_batch=crops_per_step if world > 1 else None,
                )
        else:
            logger.write(
                f"data-parallel requested but {crops_per_step} crops/step "
                f"not divisible by {len(jax.local_devices())} local devices; "
                f"running single-device"
            )

    if world > 1 and len(train_list_local) < args.batch_size:
        raise ValueError(
            f"host {rank}: local datalist shard ({len(train_list_local)} volumes) "
            f"smaller than batch_size {args.batch_size} — with drop_last the "
            "loader would yield nothing; use more data or a smaller batch"
        )
    train_loader = DataLoader(
        train_ds,
        batch_size=args.batch_size,
        shuffle=True,
        num_workers=cfg.data.num_workers,
        seed=args.seed,
        device_put=put,
        # multi-host: hosts may hold uneven shards; a short tail batch on one
        # host would diverge the SPMD global shape (see shard_batch_multihost)
        drop_last=world > 1,
    )
    val_loader = DataLoader(
        val_ds, batch_size=1, shuffle=False, num_workers=cfg.data.num_workers
    )

    crop = cfg.model.crop_size
    sample = jnp.zeros((1, crop, crop, crop, cfg.model.in_channels), jnp.float32)
    state = create_train_state(
        model,
        rng=jax.random.key(args.seed + fold_idx),
        sample_input=sample,
        learning_rate=args.learning_rate,
        weight_decay=1e-5,
    )
    if mesh is not None:
        from medseg.parallel.runtime import replicate_multihost

        state = state.replace(
            params=replicate_multihost(mesh, state.params),
            opt_state=replicate_multihost(mesh, state.opt_state),
        )
    if args.pretrained and os.path.exists(args.pretrained):
        logger.write(f"loading pretrained weights: {args.pretrained}")
        if args.pretrained.endswith((".pth", ".pt")):
            state = state.replace(
                params=load_torch_checkpoint(args.pretrained, state.params)
            )
        else:
            restore_mgr = CheckpointManager(args.pretrained)
            state = restore_mgr.restore(state)

    spec = SlidingWindowSpec(
        roi=(crop,) * 3, overlap=args.sw_overlap, sw_batch=4, mode=args.sw_mode,
        bucket_multiple=32,
    )
    # when a mesh is present, eval shards the window grid across it
    validator = Validator(model, args.n_classes, cfg.data.task, spec, mesh=mesh)

    def validate_volumes(loader):
        def volume_iter():
            for batch in loader:
                yield {"image": batch["image"][0], "label": batch["label"][0]}
        return volume_iter

    # checkpoint I/O from host 0 only (params are replicated, so host 0's
    # copy is the global state; every host restores the same files)
    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    resumed = False
    if args.mode == "train" and (ckpt.exists() or ckpt.exists("latest")):
        # crash recovery: resume from whichever of latest/best is newer
        # (a scheduled --save-latest-every save past the last best means the
        # previous run died mid-interval)
        state = ckpt.restore_freshest(state)
        resumed = True
        logger.write(f"resuming from checkpoint at step {int(state.step)}")
    elif args.mode == "eval" and ckpt.exists():
        logger.write("evaluating existing best checkpoint")
        state = ckpt.restore(state)

    if args.mode == "train":
        progress = None
        if rank != 0:
            args.no_progress = True
        if not args.no_progress:
            from tqdm import tqdm

            bar = tqdm(total=args.max_iterations, dynamic_ncols=True)

            def progress(step, total, loss):
                # reference tqdm readout (`seg:214-216,228-230`); with async
                # dispatch no loss has been fetched yet for the first steps
                tag = "-----" if np.isnan(loss) else f"{loss:2.5f}"
                bar.set_description(f"Training ({step} / {total} Steps) (loss={tag})")
                bar.update(step - bar.n)

        loop = TrainLoop(
            make_train_step(
                model, task=cfg.data.task, device_augment=args.device_augment
            ),
            max_iterations=args.max_iterations,
            eval_num=args.eval_num,
            validator=lambda s: validator(
                s.params, validate_volumes(val_loader)()
            ).mean_dice,
            checkpointer=ckpt if rank == 0 else None,
            log_fn=lambda msg: (print(msg), logger.write(msg)),
            save_latest_every=args.save_latest_every,
            sync_every=args.sync_every,
            progress=progress,
        )
        if resumed:
            # seed the best-so-far from the sidecar metadata so a resumed run
            # only overwrites "best" on a genuine improvement — without this,
            # the first post-resume validation always saved as best even when
            # its Dice was worse than the historical best (round-4 advisor)
            meta = ckpt.metadata()
            if "dice" in meta:
                loop.best_metric = float(meta["dice"])
                loop.best_step = int(meta.get("step", -1))
                logger.write(
                    f"resume: historical best Dice {loop.best_metric:.5f} "
                    f"at step {loop.best_step}"
                )

        def batches():
            while True:
                yield from train_loader

        state = loop.run(state, batches())
        if progress is not None:
            bar.close()
        if rank == 0:  # curves/series are host-0 artifacts
            save_metric_series(
                out_dir,
                f"lr_{args.learning_rate}",
                {"loss": loop.loss_history, "dice": loop.metric_history},
            )
            plot_training_curves(
                os.path.join(out_dir, "curves.png"),
                loop.loss_history,
                loop.metric_history,
                args.eval_num,
            )

    # final evaluation with all metrics (seg :623-648). Rank 0 finalizes any
    # in-flight async best-save, then all hosts synchronize before touching
    # the shared-FS checkpoint — otherwise ranks can restore divergent params
    # and the SPMD eval program runs with different weights per host.
    if rank == 0:
        ckpt.wait()
    barrier("final_checkpoint_committed")
    if ckpt.exists():
        state = ckpt.restore(state)
    result = validator(state.params, validate_volumes(val_loader)(), all_metrics=True)
    summary = {
        "dice": result.mean_dice,
        "dice_per_class": result.per_class_dice.tolist(),
        "precision": result.mean_precision,
        "recall": result.mean_recall,
        "hausdorff": result.mean_hausdorff,
    }
    logger.write(f"fold {fold_idx} final: {summary}")
    logger.event("final_metrics", fold=fold_idx, **{k: v for k, v in summary.items()})
    if rank == 0:
        save_metric_series(
            out_dir,
            "final",
            {
                "dice_per_class": result.per_class_dice,
                "precision_per_class": result.per_class_precision,
                "recall_per_class": result.per_class_recall,
                "hausdorff_per_class": result.per_class_hausdorff,
            },
        )

    # slice-overlay PDFs for fold 0 (seg :666-723); the reference renders
    # overlays from SWI at overlap=0.8 (seg :694-695), not the eval overlap.
    # The mask computation is SPMD (all hosts run it when a mesh is present);
    # only host 0 renders the PDF.
    if fold_idx == 0 and len(val_ds) > 0:
        sample0 = val_ds[0]
        image = jnp.asarray(sample0["image"])
        overlay_spec = SlidingWindowSpec(
            roi=spec.roi, overlap=0.8, sw_batch=spec.sw_batch, mode=spec.mode,
            bucket_multiple=spec.bucket_multiple,
        )
        mask = validator.predict_mask(state.params, image, overlay_spec)
        if cfg.data.task == "ct":
            pred_map = np.asarray(jnp.argmax(mask, axis=-1))
            label_map = np.asarray(sample0["label"][..., 0]).astype(np.int64)
        else:
            pred_map = np.asarray(multichannel_to_label_map(mask))
            label_map = np.asarray(
                multichannel_to_label_map(jnp.asarray(sample0["label"]))
            )
        if rank == 0:
            save_slice_overlays(
                os.path.join(out_dir, "overlays.pdf"),
                np.asarray(sample0["image"][..., 0]),
                label_map,
                pred_map,
                args.n_classes,
            )
    return summary


def main(argv=None) -> list[dict]:
    # must precede the first backend touch; no-op unless a multi-process
    # config is present (MEDSEG_DISTRIBUTED=1 on pod slices, or explicit
    # MEDSEG_COORDINATOR/NUM_PROCESSES/PROCESS_ID for manual bring-up)
    from medseg.parallel.runtime import initialize_distributed

    initialize_distributed()
    args = build_parser().parse_args(argv)
    cfg = apply_overrides(preset(args.dataset_name, args.n_classes), args)
    datalist = resolve_datalist(args.data_dir, args.dataset_name)
    folds = fold_datalists(datalist, args.dataset_name, args.folds, cfg.data.cv_seed)
    results = []
    if args.max_folds is not None:
        folds = folds[: args.max_folds]
    for fold_idx, (train_list, val_list) in enumerate(folds):
        train_list = subsample_train(train_list, args.train_size)
        results.append(run_fold(args, cfg, fold_idx, train_list, val_list))
    return results


if __name__ == "__main__":
    main()
