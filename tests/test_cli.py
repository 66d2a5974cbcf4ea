"""End-to-end CLI smoke tests on synthetic Decathlon data (tiny model).

These exercise the full reference workflow surface: k-fold setup, training
with periodic validation + best checkpointing, final all-metrics eval,
artifact dumps (`unetr_segmentation_3d.py:561-723`), and the two-stage
pretraining driver (`unetr_ranking_pretraining_3d.py:506-611`).
"""

import glob
import json
import os

import numpy as np
import pytest

from medseg.data.nifti import write_nifti

TINY = [
    "--crop-size", "32",
    "--feature-size", "2",
    "--hidden-size", "16",
    "--mlp-dim", "32",
    "--num-heads", "2",
    "--num-layers", "4",
    "--num-workers", "2",
]


def make_dataset(tmp_path, n=4, shape=(36, 36, 36)):
    rng = np.random.default_rng(0)
    root = tmp_path / "data" / "TinyCT"
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir(parents=True)
    entries = []
    for i in range(n):
        img = rng.normal(100.0, 80.0, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.float32)
        lab[8:20, 8:20, 8:20] = 1.0
        write_nifti(str(root / "imagesTr" / f"i{i}.nii.gz"), img)
        write_nifti(str(root / "labelsTr" / f"l{i}.nii.gz"), lab)
        entries.append({"image": f"imagesTr/i{i}.nii.gz", "label": f"labelsTr/l{i}.nii.gz"})
    with open(root / "dataset.json", "w") as f:
        json.dump({"training": entries}, f)
    return str(tmp_path / "data")


@pytest.mark.slow
def test_segmentation_cli_end_to_end(tmp_path):
    from medseg.cli.segmentation import main

    data_dir = make_dataset(tmp_path)
    out_root = str(tmp_path / "results")
    results = main(
        [
            data_dir, "TinyCT", out_root, "2", "", "train", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "2", "--eval-num", "1",
        ]
        + TINY
    )
    assert len(results) == 1
    for r in results:
        assert np.isfinite(r["dice"])
        assert len(r["dice_per_class"]) == 2
    fold0 = os.path.join(out_root, "TinyCT_0")
    assert os.path.isdir(os.path.join(fold0, "checkpoints", "best"))
    assert glob.glob(os.path.join(fold0, "*loss.npy"))
    assert os.path.exists(os.path.join(fold0, "curves.png"))
    assert glob.glob(os.path.join(fold0, "*_logger.txt"))

    # eval mode restores the checkpoint and reproduces metrics
    results2 = main(
        [
            data_dir, "TinyCT", out_root, "2", "", "eval", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "2", "--eval-num", "1",
        ]
        + TINY
    )
    assert results2[0]["dice"] == pytest.approx(results[0]["dice"], abs=1e-5)


@pytest.mark.slow
def test_pretraining_cli_end_to_end(tmp_path):
    from medseg.cli.pretraining import main

    data_dir = make_dataset(tmp_path, n=4)
    out_root = str(tmp_path / "results_ranking")
    out_dirs = main(
        [
            data_dir, "TinyCT", out_root, "2", "1e-3", "0.1", "ranking",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "1", "--eval-num", "2",
        ]
        + TINY
    )
    assert len(out_dirs) == 1
    d0 = out_dirs[0]
    # both stages saved checkpoints + loss-vs-time plots
    assert os.path.isdir(os.path.join(d0, "feat_lr_0.001_temp_0.1"))
    assert os.path.isdir(os.path.join(d0, "recon_lr_0.001_temp_0.1"))
    assert glob.glob(os.path.join(d0, "*loss_vs_time.png"))


@pytest.mark.slow
def test_pretrain_then_finetune_handoff(tmp_path):
    """The reference workflow: pretraining checkpoint feeds fine-tuning via
    the PRETRAINED path argument (`unetr_segmentation_3d.py:515-518`)."""
    from medseg.cli.pretraining import main as pretrain_main
    from medseg.cli.segmentation import main as seg_main

    data_dir = make_dataset(tmp_path, n=4)
    pre_root = str(tmp_path / "results_ranking")
    out_dirs = pretrain_main(
        [
            data_dir, "TinyCT", pre_root, "2", "1e-3", "0.1", "ranking",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "1", "--eval-num", "100",
        ]
        + TINY
    )
    ckpt = os.path.join(out_dirs[0], "recon_lr_0.001_temp_0.1")
    results = seg_main(
        [
            data_dir, "TinyCT", str(tmp_path / "results_seg"), "2", ckpt,
            "train", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "1", "--eval-num", "1",
        ]
        + TINY
    )
    assert np.isfinite(results[0]["dice"])
    # ranking-pretrained output dir gets the suffix (seg :299-302)
    assert os.path.isdir(str(tmp_path / "results_seg_pretrained_ranking"))


@pytest.mark.slow
def test_infer_cli_writes_predictions(tmp_path):
    """Serving path: checkpoint -> sliding-window inference -> NIfTI masks."""
    from medseg.cli.infer import main as infer_main
    from medseg.cli.segmentation import main as seg_main
    from medseg.data.nifti import read_nifti

    data_dir = make_dataset(tmp_path, n=3)
    out_root = str(tmp_path / "results")
    seg_main(
        [
            data_dir, "TinyCT", out_root, "2", "", "train", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "1", "--eval-num", "1",
        ]
        + TINY
    )
    ckpt = os.path.join(out_root, "TinyCT_0", "checkpoints")
    pred_dir = str(tmp_path / "preds")
    written = infer_main(
        [data_dir, "TinyCT", ckpt, pred_dir, "2"] + TINY
    )
    assert len(written) == 3
    for path in written:
        img = read_nifti(path)
        assert img.data.shape == (36, 36, 36)
        assert set(np.unique(img.data)).issubset({0, 1})


@pytest.mark.slow
def test_segmentation_cli_data_parallel(tmp_path):
    """Config-5 path: crop batch sharded over the 8-device virtual mesh."""
    from medseg.cli.segmentation import main

    data_dir = make_dataset(tmp_path, n=4)
    results = main(
        [
            data_dir, "TinyCT", str(tmp_path / "results_dp"), "2", "", "train",
            "1e6", "1e-3", "--folds", "2", "--max-folds", "1",
            "--max-iterations", "1", "--eval-num", "1",
            "--batch-size", "2", "--data-parallel",
        ]
        + TINY
    )
    assert np.isfinite(results[0]["dice"])
