"""Dataset split + loader tests, including the crop-list collation contract
and an end-to-end synthetic-NIfTI pipeline (SURVEY.md §4.3)."""

import json
import os

import numpy as np
import pytest

from medseg.data import transforms as T
from medseg.data.dataset import (
    CacheDataset,
    CrossValidationFolds,
    ListDataset,
    decollate_batch,
    kfold_split,
    load_decathlon_datalist,
)
from medseg.data.loader import DataLoader, collate
from medseg.data.nifti import write_nifti
from medseg.data.sampling import rand_crop_by_pos_neg_label


def make_decathlon_dir(tmp_path, n=6, shape=(16, 16, 16)):
    """Tiny MSD-format dataset per the layout the reference documents at
    `unetr_segmentation_3d.py:538-544`."""
    rng = np.random.default_rng(0)
    root = tmp_path / "dataset" / "TinyTask"
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir(parents=True)
    entries = []
    for i in range(n):
        img = rng.normal(0.5, 0.3, size=shape).astype(np.float32)
        lab = (img > 0.7).astype(np.float32)
        write_nifti(str(root / "imagesTr" / f"img{i:03d}.nii.gz"), img)
        write_nifti(str(root / "labelsTr" / f"lab{i:03d}.nii.gz"), lab)
        entries.append(
            {"image": f"imagesTr/img{i:03d}.nii.gz", "label": f"labelsTr/lab{i:03d}.nii.gz"}
        )
    with open(root / "dataset.json", "w") as f:
        json.dump({"training": entries}, f)
    return str(root)


def test_load_decathlon_datalist(tmp_path):
    root = make_decathlon_dir(tmp_path)
    dl = load_decathlon_datalist(os.path.join(root, "dataset.json"))
    assert len(dl) == 6
    assert all(os.path.isabs(d["image"]) and os.path.exists(d["image"]) for d in dl)


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    for n, k in [(10, 5), (13, 5), (7, 3)]:
        ours = list(kfold_split(n, k))
        theirs = list(KFold(n_splits=k).split(range(n)))
        for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
            np.testing.assert_array_equal(tr_a, tr_b)
            np.testing.assert_array_equal(te_a, te_b)


def test_cross_validation_folds_partition():
    data = [{"i": i} for i in range(23)]
    cv = CrossValidationFolds(data, nfolds=5, seed=12345)
    all_items = []
    for f in range(5):
        fold = cv.get_datalist(f)
        all_items.extend(d["i"] for d in fold)
    assert sorted(all_items) == list(range(23))
    # train split = all other folds (reference seg :572)
    train = cv.get_datalist([f for f in range(5) if f != 0])
    val = cv.get_datalist(0)
    assert len(train) + len(val) == 23
    assert not set(d["i"] for d in train) & set(d["i"] for d in val)
    # seeded -> reproducible
    cv2 = CrossValidationFolds(data, nfolds=5, seed=12345)
    assert cv.partitions == cv2.partitions


def test_collate_flattens_crop_lists(rng):
    crops_a = [{"image": rng.normal(size=(4, 4, 4, 1)).astype(np.float32)} for _ in range(4)]
    crops_b = [{"image": rng.normal(size=(4, 4, 4, 1)).astype(np.float32)} for _ in range(4)]
    batch = collate([crops_a, crops_b])
    assert batch["image"].shape == (8, 4, 4, 4, 1)  # 2 volumes x 4 crops


def test_decollate_batch(rng):
    batch = {"image": rng.normal(size=(3, 2, 2, 2, 1)), "path": ["a", "b", "c"]}
    items = decollate_batch(batch)
    assert len(items) == 3
    assert items[1]["path"] == "b"
    np.testing.assert_array_equal(items[2]["image"], batch["image"][2])


def test_loader_shuffle_determinism(rng):
    data = [{"image": np.full((2, 2, 2, 1), float(i), np.float32)} for i in range(10)]
    ds = ListDataset(data)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=42, num_workers=2)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=42, num_workers=2)
    e1 = [b["image"][:, 0, 0, 0, 0].tolist() for b in l1]
    e2 = [b["image"][:, 0, 0, 0, 0].tolist() for b in l2]
    assert e1 == e2
    # next epoch differs
    e1b = [b["image"][:, 0, 0, 0, 0].tolist() for b in l1]
    assert e1b != e1
    # all items seen once
    assert sorted(x for b in e1 for x in b) == [float(i) for i in range(10)]


def test_loader_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Boom(), batch_size=1))


def test_end_to_end_spleen_style_pipeline(tmp_path):
    """MSD dir -> datalist -> CV folds -> transform chain with 4-crop sampling
    -> loader: device batch is (batch*num_samples, crop^3, 1) like the
    reference's batch of 4 at seg :586-588."""
    root = make_decathlon_dir(tmp_path, n=5, shape=(20, 18, 16))
    dl = load_decathlon_datalist(os.path.join(root, "dataset.json"))
    cv = CrossValidationFolds(dl, nfolds=5, seed=12345)
    train_list = cv.get_datalist([1, 2, 3, 4])

    crop_rng = np.random.default_rng(0)
    chain = T.Compose(
        [
            T.load,
            T.ensure_channel,
            T.orient_ras,
            T.scale_intensity_range,
            lambda s: rand_crop_by_pos_neg_label(
                s, spatial_size=(8, 8, 8), num_samples=4, rng=crop_rng
            ),
        ]
    )
    ds = CacheDataset(train_list, transform=chain)
    loader = DataLoader(ds, batch_size=1, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["image"].shape == (4, 8, 8, 8, 1)
        assert b["label"].shape == (4, 8, 8, 8, 1)
        assert b["image"].dtype == np.float32
