"""End-to-end CLI drive for /verify: tiny synthetic Decathlon dir ->
segmentation CLI (train 2 iters, eval, checkpoints, artifacts). CPU-safe
(run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu during axon outages)."""
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medseg.data.nifti import write_nifti


def make_dataset(root_dir, n=4, shape=(36, 36, 36)):
    rng = np.random.default_rng(0)
    root = os.path.join(root_dir, "data", "TinyCT")
    os.makedirs(os.path.join(root, "imagesTr"))
    os.makedirs(os.path.join(root, "labelsTr"))
    entries = []
    for i in range(n):
        img = rng.normal(100.0, 80.0, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.float32)
        lab[8:20, 8:20, 8:20] = 1.0
        write_nifti(os.path.join(root, "imagesTr", f"i{i}.nii.gz"), img)
        write_nifti(os.path.join(root, "labelsTr", f"l{i}.nii.gz"), lab)
        entries.append(
            {"image": f"imagesTr/i{i}.nii.gz", "label": f"labelsTr/l{i}.nii.gz"}
        )
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump({"training": entries}, f)
    return os.path.join(root_dir, "data")


def main():
    from medseg.cli.segmentation import main as seg_main

    tmp = tempfile.mkdtemp(prefix="verify_cli_")
    data_dir = make_dataset(tmp)
    out_root = os.path.join(tmp, "results")
    results = seg_main(
        [
            data_dir, "TinyCT", out_root, "2", "", "train", "1e6", "1e-3",
            "--folds", "2", "--max-folds", "1",
            "--max-iterations", "2", "--eval-num", "1",
            "--crop-size", "32", "--feature-size", "2",
            "--hidden-size", "16", "--mlp-dim", "32",
            "--num-heads", "2", "--num-layers", "4", "--num-workers", "2",
        ]
    )
    assert len(results) == 1, results
    assert np.isfinite(results[0]["dice"]), results
    fold0 = os.path.join(out_root, "TinyCT_0")
    assert os.path.isdir(os.path.join(fold0, "checkpoints", "best")), "no best ckpt"
    assert glob.glob(os.path.join(fold0, "*loss.npy")), "no loss series"
    assert os.path.exists(os.path.join(fold0, "curves.png")), "no curves"
    print("CLI VERIFY OK", json.dumps(results[0]["dice"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
