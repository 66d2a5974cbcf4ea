"""Trained-model Dice delta for MEDSEG_FAST_GELU (tanh-approx serving GELU).

The round-3 knob sweep measured MEDSEG_FAST_GELU=1 at +4.5% serving
throughput (docs/PERF_NOTES.md round-3c) but only had random-init argmax
agreement (99.05%) as numerics evidence. This script produces the
trained-model evidence the promotion decision needs:

1. Build the synthetic-organ CT dataset (same fixture as
   tests/test_tpu_learning.py) and train a full-size UNETR-B/16 for 150
   steps on the real chip via the segmentation CLI (binary spleen-like
   config, 96^3 crops — reference workload `unetr_segmentation_3d.py:211-268`).
2. Re-evaluate the best checkpoint in two fresh subprocesses with
   MEDSEG_FAST_GELU=0 and =1. The knob is read at trace time
   (medseg/kernels/unetr_of.py:330), so a process boundary is the only safe
   toggle.
3. Print both mean Dice values and the delta.

Run from the repo root on the TPU host:
    python benchmarks/gelu_dice_delta.py [workdir]

The workdir (default /tmp/gelu_delta) is reused across invocations: if a
best checkpoint already exists, training is skipped and only the two evals
run.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_ENV = {
    "JAX_COMPILATION_CACHE_DIR": os.path.expanduser("~/.cache/jax_medseg"),
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "2.0",
}


def cli_args(data_dir, results_dir, mode):
    return [
        sys.executable, "-m", "medseg.cli.segmentation",
        data_dir, "OrganCT", results_dir, "2", "", mode, "1e6", "1e-4",
        "--folds", "4", "--max-folds", "1",
        "--max-iterations", "150", "--eval-num", "50",
        "--crop-size", "96", "--bf16", "--sync-every", "10",
    ]


def run(cmd, extra_env):
    env = dict(os.environ, **CACHE_ENV, **extra_env)
    print(f"$ MEDSEG_FAST_GELU={extra_env.get('MEDSEG_FAST_GELU', '?')} "
          f"{' '.join(cmd[2:6])} ... {cmd[8]}", flush=True)
    subprocess.run(cmd, check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def last_final_dice(results_dir, skip_lines=0):
    """Read the newest final_metrics event appended after `skip_lines`."""
    paths = []
    for root, _, files in os.walk(results_dir):
        paths.extend(os.path.join(root, f) for f in files if f.endswith("_events.jsonl"))
    assert len(paths) == 1, f"expected one events file, found {paths}"
    with open(paths[0]) as f:
        lines = f.readlines()[skip_lines:]
    finals = [json.loads(ln) for ln in lines if '"final_metrics"' in ln]
    assert finals, "no final_metrics event found"
    return finals[-1], paths[0]


def count_lines(results_dir):
    for root, _, files in os.walk(results_dir):
        for f in files:
            if f.endswith("_events.jsonl"):
                with open(os.path.join(root, f)) as fh:
                    return sum(1 for _ in fh)
    return 0


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gelu_delta"
    data_dir = os.path.join(work, "data")
    results_dir = os.path.join(work, "results")

    if not os.path.exists(os.path.join(data_dir, "OrganCT", "dataset.json")):
        from tests.test_tpu_learning import make_organ_dataset
        import pathlib
        import shutil
        # a partially built dataset from an interrupted run (imagesTr present,
        # dataset.json missing) would crash make_organ_dataset's mkdir
        shutil.rmtree(os.path.join(data_dir, "OrganCT"), ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        make_organ_dataset(pathlib.Path(work))
        print(f"built organ dataset under {data_dir}", flush=True)

    # CheckpointManager.__init__ creates the bare "checkpoints" dir before any
    # save; only a committed "best" subdir means a trained model exists (an
    # eval against random-init params would report a meaningless delta)
    have_ckpt = any(
        os.path.basename(root) == "checkpoints" and "best" in dirs
        for root, dirs, _ in os.walk(results_dir)
    )
    if not have_ckpt:
        run(cli_args(data_dir, results_dir, "train"), {"MEDSEG_FAST_GELU": "0"})
        train_metrics, _ = last_final_dice(results_dir)
        print(f"train-run final: dice={train_metrics['dice']:.5f}", flush=True)
    else:
        print("best checkpoint exists; skipping training", flush=True)

    dice = {}
    for flag in ("0", "1"):
        skip = count_lines(results_dir)
        run(cli_args(data_dir, results_dir, "eval"), {"MEDSEG_FAST_GELU": flag})
        metrics, path = last_final_dice(results_dir, skip_lines=skip)
        dice[flag] = metrics
        print(f"MEDSEG_FAST_GELU={flag}: dice={metrics['dice']:.6f} "
              f"per_class={metrics['dice_per_class']}", flush=True)

    d0, d1 = dice["0"]["dice"], dice["1"]["dice"]
    # sanity floor: a fresh 150-step run on this fixture reaches Dice ~0.95;
    # anything near random-init means the restore went wrong and the delta
    # would be meaningless noise
    assert d0 >= 0.5, f"exact-GELU eval Dice {d0:.4f} < 0.5 — restored model untrained?"
    print(json.dumps({
        "dice_exact_gelu": d0,
        "dice_fast_gelu": d1,
        "dice_delta": d1 - d0,
        "per_class_exact": dice["0"]["dice_per_class"],
        "per_class_fast": dice["1"]["dice_per_class"],
    }), flush=True)


if __name__ == "__main__":
    main()
