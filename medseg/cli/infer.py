"""Serving CLI: whole-volume segmentation inference to NIfTI masks.

The reference has no standalone inference entry point (predictions only
materialize inside its visualization block, `unetr_segmentation_3d.py:687-723`);
this driver is the production serving path the rebuild adds: load a
checkpoint (orbax dir or reference ``.pth``), run compiled sliding-window
inference over a Decathlon ``imagesTs``/``imagesTr`` list or explicit files,
and write label-map NIfTIs resampled metadata intact.

    python -m medseg.cli.infer DATA_DIR DATASET_NAME CHECKPOINT OUT_DIR N_CLASSES \
        [--sw-overlap 0.5] [--sw-mode gaussian] [--bf16]

Defaults are the fast serving configuration: on TPU the fused Pallas
forward + z-row walk engage automatically (same auto-detect as
``engine.evaluate.Validator``) and preprocessing runs on DEVICE
(``data.pipelines.val_transforms_device`` — NIfTI decode on host, respace/
orient/window/crop as XLA programs). ``--no-fast-path`` / ``--host-preprocess``
restore the plain paths. The printed throughput is END TO END per volume:
decode + preprocess + sliding-window inference + mask post + NIfTI write.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from medseg.cli.common import apply_overrides, build_model
from medseg.config import preset
from medseg.data import transforms as T
from medseg.data.dataset import load_decathlon_datalist
from medseg.data.nifti import write_nifti
from medseg.data.pipelines import val_transforms
from medseg.engine.checkpoint import CheckpointManager, load_torch_checkpoint
from medseg.engine.evaluate import Validator
from medseg.engine.state import create_train_state
from medseg.ops.sliding_window import SlidingWindowSpec
from medseg.utils.profiling import Throughput


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir", type=str)
    p.add_argument("dataset_name", type=str)
    p.add_argument("checkpoint", type=str)
    p.add_argument("out_dir", type=str)
    p.add_argument("n_classes", type=int)
    p.add_argument("--list-key", type=str, default="training",
                   help="dataset.json list to read (training/test)")
    p.add_argument("--sw-overlap", type=float, default=0.25)
    p.add_argument("--sw-mode", type=str, default="constant", choices=["constant", "gaussian"])
    p.add_argument("--sw-batch", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-path", dest="fast_path", action="store_true", default=None,
                   help="force the fused Pallas serving forward (default: auto on TPU)")
    p.add_argument("--no-fast-path", dest="fast_path", action="store_false",
                   help="force the plain flax forward")
    p.add_argument("--host-preprocess", action="store_true",
                   help="run the preprocessing chain on host (numpy) instead of device")
    p.add_argument("--no-prefetch", dest="prefetch", action="store_false",
                   default=True,
                   help="disable the decode/write pipeline (serial per-volume)")
    p.add_argument("--stats-json", type=str, default=None,
                   help="write end-to-end throughput stats to this JSON file")
    p.add_argument("--acc", type=str, default="bf16", choices=["bf16", "fp32"],
                   help="blend accumulator dtype (bf16 = serving default, "
                        "~0.4%% relative blend error; fp32 = MONAI-parity)")
    # model-size overrides
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--feature-size", type=int, default=16)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--mlp-dim", type=int, default=3072)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-workers", type=int, default=4)
    return p


def main(argv=None) -> list[str]:
    args = build_parser().parse_args(argv)
    cfg = apply_overrides(preset(args.dataset_name, args.n_classes), args)
    model = build_model(args, cfg, remat=False)

    json_path = os.path.join(args.data_dir, args.dataset_name, "dataset.json")
    datalist = load_decathlon_datalist(json_path, True, args.list_key)

    crop = cfg.model.crop_size
    sample = jnp.zeros((1, crop, crop, crop, cfg.model.in_channels), jnp.float32)
    state = create_train_state(
        model, rng=jax.random.key(0), sample_input=sample,
        learning_rate=1e-4, weight_decay=1e-5,
    )
    if args.checkpoint.endswith((".pth", ".pt")):
        params = load_torch_checkpoint(args.checkpoint, state.params)
    else:
        params = CheckpointManager(args.checkpoint).restore(state).params

    spec = SlidingWindowSpec(
        roi=(crop,) * 3, overlap=args.sw_overlap, sw_batch=args.sw_batch,
        mode=args.sw_mode, bucket_multiple=32,
    )
    validator = Validator(
        model, args.n_classes, cfg.data.task, spec,
        use_fast_path=args.fast_path, acc_dtype=args.acc,
    )
    if args.host_preprocess:
        chain = val_transforms(cfg.data)
    else:
        from medseg.data.pipelines import val_transforms_device

        chain = val_transforms_device(cfg.data)

    os.makedirs(args.out_dir, exist_ok=True)
    written = []
    tp = Throughput()
    first_vol_time = None
    t_start = time.perf_counter()

    def load(entry):
        sample_dict = chain({"image": entry["image"]})
        return jnp.asarray(sample_dict["image"]), sample_dict.get("image_affine")

    def save(out_path, label_map, affine):
        write_nifti(out_path, label_map, affine)

    # Serving pipeline: a prefetch thread decodes+preprocesses volume N+1
    # while the device runs SWI on volume N, and a writer thread overlaps the
    # NIfTI encode/write — steady-state e2e approaches max(decode, SWI, write)
    # instead of their sum. JAX dispatch is thread-safe; device work stays
    # serialized on the one stream.
    executor = writer = None
    if args.prefetch:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)
        writer = ThreadPoolExecutor(max_workers=1)
        pending_writes = []
        futures = [executor.submit(load, e) for e in datalist[:1]]

    for i, entry in enumerate(datalist):
        t0 = time.perf_counter()
        if args.prefetch:
            image, affine = futures[i].result()
            if i + 1 < len(datalist):
                futures.append(executor.submit(load, datalist[i + 1]))
        else:
            image, affine = load(entry)
        mask = validator.predict_mask(params, image)
        if cfg.data.task == "ct":
            label_map = np.asarray(jnp.argmax(mask, axis=-1)).astype(np.int16)
        else:
            from medseg.ops.post import multichannel_to_label_map

            label_map = np.asarray(multichannel_to_label_map(mask)).astype(np.int16)
        tp.update(1)
        name = os.path.basename(entry["image"]).replace(".nii", "_pred.nii")
        out_path = os.path.join(args.out_dir, name)
        if args.prefetch:
            pending_writes.append(writer.submit(save, out_path, label_map, affine))
        else:
            save(out_path, label_map, affine)
        written.append(out_path)
        if first_vol_time is None:
            first_vol_time = time.perf_counter() - t0
        print(
            f"{entry['image']} -> {out_path} "
            f"({time.perf_counter() - t0:.2f}s end-to-end, {tp.rate:.3f} vol/s)"
        )
    if args.prefetch:
        for f in pending_writes:
            f.result()
        executor.shutdown()
        writer.shutdown()
    stats = {"volumes": len(written), "first_volume_seconds": first_vol_time}
    if len(written) > 1:
        # steady-state end-to-end rate excluding the first (compile) volume
        rate = (len(written) - 1) / max(
            time.perf_counter() - t_start - first_vol_time, 1e-9
        )
        stats["e2e_volumes_per_sec"] = round(rate, 4)
        print(f"end-to-end (decode+preprocess+SWI+mask+write, excl. compile "
              f"volume): {rate:.3f} vol/s")
    if args.stats_json:
        import json

        with open(args.stats_json, "w") as f:
            json.dump(stats, f)
    return written


if __name__ == "__main__":
    main()
