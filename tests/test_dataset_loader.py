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


def test_partition_dataset_strided_rule():
    """MONAI 0.6 ``partition_dataset`` documented example: data [1..5],
    2 partitions, no shuffle -> [[1,3,5],[2,4]] (STRIDED, not contiguous)."""
    from medseg.data.dataset import partition_dataset_indices

    parts = partition_dataset_indices(5, 2, shuffle=False)
    assert [list(p) for p in parts] == [[0, 2, 4], [1, 3]]
    # shuffled rule: RandomState(seed).shuffle(indices), then strided
    parts = partition_dataset_indices(23, 5, shuffle=True, seed=12345)
    idx = np.arange(23)
    np.random.RandomState(12345).shuffle(idx)
    for i, p in enumerate(parts):
        np.testing.assert_array_equal(p, idx[i::5])


def test_decathlon_dataset_sections(tmp_path):
    """DecathlonDataset section split: seeded shuffle, first val_frac of the
    shuffled indices = validation, rest = training; test section = 'test' key."""
    from medseg.data.dataset import DecathlonDataset

    root = make_decathlon_dir(tmp_path, n=10)
    data_dir = os.path.dirname(root)
    # add a test list (bare image paths, MONAI contract)
    with open(os.path.join(root, "dataset.json")) as f:
        meta = json.load(f)
    meta["test"] = [e["image"] for e in meta["training"][:3]]
    meta["labels"] = {"0": "background", "1": "organ"}
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump(meta, f)

    tr = DecathlonDataset(data_dir, "TinyTask", section="training")
    va = DecathlonDataset(data_dir, "TinyTask", section="validation")
    te = DecathlonDataset(data_dir, "TinyTask", section="test")
    assert len(tr) == 8 and len(va) == 2 and len(te) == 3
    tr_imgs = {d["image"] for d in tr.data}
    va_imgs = {d["image"] for d in va.data}
    assert not tr_imgs & va_imgs and len(tr_imgs | va_imgs) == 10
    # exact membership per the MONAI rule
    idx = np.arange(10)
    np.random.RandomState(0).shuffle(idx)
    assert {os.path.basename(d["image"]) for d in va.data} == {
        f"img{i:03d}.nii.gz" for i in idx[:2]
    }
    assert te.data[0]["image"].endswith(".nii.gz")
    assert tr.properties["labels"] == {"0": "background", "1": "organ"}
    with pytest.raises(FileNotFoundError, match="not supported"):
        DecathlonDataset(data_dir, "MissingTask", download=True)


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


def test_msd_layout_validator(tmp_path):
    """Partial MSD tasks produce the documented error surface (the offline
    stand-in for DecathlonDataset(download=True)'s verify step)."""
    import json

    from medseg.data.dataset import DecathlonDataset, validate_msd_layout

    task = tmp_path / "Task09_Spleen"
    (task / "imagesTr").mkdir(parents=True)
    (task / "labelsTr").mkdir()
    items = []
    for i in range(3):
        img = task / "imagesTr" / f"spleen_{i}.nii.gz"
        lab = task / "labelsTr" / f"spleen_{i}.nii.gz"
        img.write_bytes(b"x")
        lab.write_bytes(b"x")
        items.append(
            {"image": f"./imagesTr/spleen_{i}.nii.gz", "label": f"./labelsTr/spleen_{i}.nii.gz"}
        )
    meta = {"name": "Spleen", "numTraining": 3, "training": items, "test": []}
    (task / "dataset.json").write_text(json.dumps(meta))

    ds = DecathlonDataset(str(tmp_path), "Task09_Spleen", section="training")
    assert len(ds) > 0  # complete layout validates

    (task / "labelsTr" / "spleen_1.nii.gz").unlink()
    with pytest.raises(RuntimeError, match="spleen_1.nii.gz"):
        DecathlonDataset(str(tmp_path), "Task09_Spleen", section="training")

    meta_bad = dict(meta, numTraining=5)
    (task / "labelsTr" / "spleen_1.nii.gz").write_bytes(b"x")
    (task / "dataset.json").write_text(json.dumps(meta_bad))
    with pytest.raises(RuntimeError, match="numTraining=5"):
        DecathlonDataset(str(tmp_path), "Task09_Spleen", section="training")
