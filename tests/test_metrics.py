"""Metric accumulator tests: dice, precision/sensitivity, Hausdorff.

Contracts from MONAI 0.6 metrics at `/root/reference/unetr_segmentation_3d.py:484-496`
with the accumulate -> aggregate -> reset protocol used at `:118-129`.
"""

import numpy as np
import pytest

from medseg.ops.metrics import (
    ConfusionAccumulator,
    DiceAccumulator,
    HausdorffAccumulator,
    dice_scores,
    hausdorff_distance,
)


def onehot_vol(labels, k):
    return np.eye(k, dtype=np.float32)[labels]


def test_dice_hand_computed():
    pred = np.zeros((1, 4, 4, 1, 2), np.float32)
    target = np.zeros((1, 4, 4, 1, 2), np.float32)
    pred[0, :2, :, 0, 1] = 1  # 8 voxels class 1
    target[0, :1, :, 0, 1] = 1  # 4 voxels, all inside pred
    pred[..., 0] = 1 - pred[..., 1]
    target[..., 0] = 1 - target[..., 1]
    d = np.asarray(dice_scores(pred, target))
    # class1: 2*4/(8+4) = 2/3 ; class0: 2*8/(8+12) = 0.8
    np.testing.assert_allclose(d[0], [0.8, 2 / 3], rtol=1e-6)


def test_dice_empty_is_nan_and_nanmean():
    acc = DiceAccumulator()
    pred = np.zeros((1, 2, 2, 2, 2), np.float32)
    target = np.zeros((1, 2, 2, 2, 2), np.float32)
    pred[..., 0] = 1
    target[..., 0] = 1  # class 0 perfect, class 1 absent in both -> NaN
    acc(pred, target)
    assert float(acc.aggregate("mean")) == pytest.approx(1.0)  # nanmean skips NaN
    per_class = acc.aggregate("mean_batch")
    assert per_class[0] == pytest.approx(1.0)
    assert np.isnan(per_class[1])


def test_confusion_precision_recall(rng):
    k = 3
    labels = rng.integers(0, k, size=(2, 6, 6, 6))
    preds = rng.integers(0, k, size=(2, 6, 6, 6))
    p1 = ConfusionAccumulator("precision")
    r1 = ConfusionAccumulator("sensitivity")
    p1(onehot_vol(preds, k), onehot_vol(labels, k))
    r1(onehot_vol(preds, k), onehot_vol(labels, k))

    # numpy oracle
    precisions, recalls = [], []
    for b in range(2):
        for c in range(k):
            tp = np.sum((preds[b] == c) & (labels[b] == c))
            fp = np.sum((preds[b] == c) & (labels[b] != c))
            fn = np.sum((preds[b] != c) & (labels[b] == c))
            precisions.append(tp / (tp + fp) if tp + fp else np.nan)
            recalls.append(tp / (tp + fn) if tp + fn else np.nan)
    np.testing.assert_allclose(
        float(p1.aggregate("mean")), np.nanmean(precisions), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(r1.aggregate("mean")), np.nanmean(recalls), rtol=1e-6
    )


def test_accumulate_across_calls_and_reset(rng):
    acc = DiceAccumulator()
    k = 2
    a = rng.integers(0, k, size=(1, 4, 4, 4))
    b = rng.integers(0, k, size=(1, 4, 4, 4))
    acc(onehot_vol(a, k), onehot_vol(a, k))  # perfect
    acc(onehot_vol(b, k), onehot_vol(1 - b, k))  # perfectly wrong
    mean = float(acc.aggregate("mean"))
    assert 0.0 < mean < 1.0
    acc.reset()
    with pytest.raises(RuntimeError):
        acc.aggregate()


def test_hausdorff_known_distance():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:4, 2:4, 2:4] = True
    b[2:4, 2:4, 2:4] = True
    assert hausdorff_distance(a, b) == 0.0
    c = np.zeros((10, 10, 10), bool)
    c[2:4, 2:4, 5:7] = True  # same block shifted +3 in z
    assert hausdorff_distance(a, c) == pytest.approx(3.0)


def test_hausdorff_empty_nan():
    a = np.zeros((5, 5, 5), bool)
    b = np.ones((5, 5, 5), bool)
    assert np.isnan(hausdorff_distance(a, b))


def test_hausdorff_accumulator(rng):
    acc = HausdorffAccumulator()
    pred = np.zeros((1, 8, 8, 8, 2), np.float32)
    target = np.zeros((1, 8, 8, 8, 2), np.float32)
    pred[0, 1:3, 1:3, 1:3, 1] = 1
    target[0, 1:3, 1:3, 1:3, 1] = 1
    pred[..., 0] = 1 - pred[..., 1]
    target[..., 0] = 1 - target[..., 1]
    acc(pred, target)
    assert float(acc.aggregate("mean")) == 0.0
