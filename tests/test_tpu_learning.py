"""Real-TPU end-to-end learning validation (VERDICT round-1 item 7).

Promotes the synthetic-organ run documented in docs/PERF_NOTES.md ("End-to-end
learning validation") into a reproducible thresholded test: full-size
UNETR-B/16 in bf16 trains through the whole pipeline (NIfTI -> CT transform
chain -> pos/neg crop sampling -> jitted train step -> sliding-window eval ->
best checkpointing) and must reach **Dice >= 0.9 within 150 steps**. The
round-1 measurement was Dice 0.967 @ 150 steps, so the threshold has margin
without being loose enough to pass on a broken model.

Run: ``MEDSEG_TEST_TPU=1 python -m pytest tests/ -m tpu -q``
(the env var keeps the real TPU backend; see tests/conftest.py).

Reference workload being validated: `unetr_segmentation_3d.py:211-268`
(train loop) + `:103-132` (validation) at the Task09-Spleen-like config
(binary classes, 96^3 crops, AdamW lr 1e-4).
"""

import json

import numpy as np
import pytest

from medseg.data.nifti import write_nifti


def make_organ_dataset(tmp_path, n=8, shape=(128, 128, 128), seed=7):
    """Synthetic CT volumes with a bright ellipsoid 'organ' on noisy tissue.

    Intensities sit inside the CT windowing range [-175, 250] so the standard
    CT transform chain (`unetr_segmentation_3d.py:332-339`) is exercised
    as-is: background ~ N(-40, 35), organ ~ N(120, 35).
    """
    rng = np.random.default_rng(seed)
    root = tmp_path / "data" / "OrganCT"
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir(parents=True)
    entries = []
    coords = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    for i in range(n):
        center = rng.uniform(0.35, 0.65, 3) * np.asarray(shape)
        radii = rng.uniform(0.12, 0.22, 3) * np.asarray(shape)
        dist = np.sum(((coords - center) / radii) ** 2, axis=-1)
        lab = (dist <= 1.0).astype(np.float32)
        img = rng.normal(-40.0, 35.0, size=shape).astype(np.float32)
        img = np.where(lab > 0, rng.normal(120.0, 35.0, size=shape).astype(np.float32), img)
        write_nifti(str(root / "imagesTr" / f"vol{i}.nii.gz"), img)
        write_nifti(str(root / "labelsTr" / f"seg{i}.nii.gz"), lab)
        entries.append(
            {"image": f"imagesTr/vol{i}.nii.gz", "label": f"labelsTr/seg{i}.nii.gz"}
        )
    with open(root / "dataset.json", "w") as f:
        json.dump({"training": entries}, f)
    return str(tmp_path / "data")


@pytest.mark.tpu
@pytest.mark.slow
def test_full_size_model_learns_on_tpu(tmp_path):
    from medseg.cli.segmentation import main

    data_dir = make_organ_dataset(tmp_path)
    results = main(
        [
            data_dir, "OrganCT", str(tmp_path / "results"), "2", "", "train",
            "1e6", "1e-4",
            "--folds", "4", "--max-folds", "1",
            "--max-iterations", "150", "--eval-num", "50",
            "--crop-size", "96", "--bf16", "--sync-every", "10",
        ]
    )
    assert len(results) == 1
    dice = results[0]["dice"]
    assert np.isfinite(dice)
    assert dice >= 0.9, f"full-size UNETR failed to learn: Dice {dice:.3f} < 0.9 @150 steps"
