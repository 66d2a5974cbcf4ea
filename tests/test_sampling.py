"""Random crop/augmentation tests: determinism, ratios, MONAI contracts."""

import numpy as np
import pytest

from medseg.data.sampling import (
    rand_crop_by_pos_neg_label,
    rand_flip,
    rand_rotate90,
    rand_shift_intensity,
    rand_spatial_crop_samples,
)


def make_sample(rng):
    img = rng.normal(0.5, 0.2, size=(24, 24, 24, 1)).astype(np.float32)
    lab = np.zeros((24, 24, 24, 1), np.float32)
    lab[4:10, 4:10, 4:10] = 1.0
    return {"image": img, "label": lab}


def test_pos_neg_crop_shapes_and_determinism(rng):
    s = make_sample(rng)
    crops1 = rand_crop_by_pos_neg_label(
        s, spatial_size=(8, 8, 8), num_samples=4, rng=np.random.default_rng(7)
    )
    crops2 = rand_crop_by_pos_neg_label(
        s, spatial_size=(8, 8, 8), num_samples=4, rng=np.random.default_rng(7)
    )
    assert len(crops1) == 4
    for c1, c2 in zip(crops1, crops2):
        assert c1["image"].shape == (8, 8, 8, 1)
        np.testing.assert_array_equal(c1["image"], c2["image"])
        np.testing.assert_array_equal(c1["crop_start"], c2["crop_start"])


def test_pos_neg_ratio(rng):
    """pos=1, neg=1 -> about half the crop centers land on foreground."""
    s = make_sample(rng)
    gen = np.random.default_rng(11)
    n_fg = 0
    n = 200
    crops = rand_crop_by_pos_neg_label(
        s, spatial_size=(8, 8, 8), num_samples=n, rng=gen
    )
    for c in crops:
        center = c["crop_start"] + 4
        n_fg += bool(s["label"][center[0], center[1], center[2], 0] > 0)
    assert 0.35 < n_fg / n < 0.65


def test_pos_neg_all_positive(rng):
    s = make_sample(rng)
    crops = rand_crop_by_pos_neg_label(
        s,
        spatial_size=(8, 8, 8),
        num_samples=50,
        pos=1,
        neg=0,
        rng=np.random.default_rng(3),
    )
    for c in crops:
        center = c["crop_start"] + 4
        assert s["label"][center[0], center[1], center[2], 0] > 0


def test_crop_pads_small_volume(rng):
    s = {
        "image": rng.normal(size=(5, 5, 5, 1)).astype(np.float32),
        "label": np.ones((5, 5, 5, 1), np.float32),
    }
    crops = rand_crop_by_pos_neg_label(
        s, spatial_size=(8, 8, 8), num_samples=1, rng=np.random.default_rng(0)
    )
    assert crops[0]["image"].shape == (8, 8, 8, 1)


def test_spatial_crop_samples(rng):
    s = make_sample(rng)
    crops = rand_spatial_crop_samples(
        s, roi_size=(8, 8, 8), num_samples=2, rng=np.random.default_rng(5)
    )
    assert len(crops) == 2
    assert not np.array_equal(crops[0]["crop_start"], crops[1]["crop_start"])
    for c in crops:
        st = c["crop_start"]
        np.testing.assert_array_equal(
            c["image"], s["image"][st[0] : st[0] + 8, st[1] : st[1] + 8, st[2] : st[2] + 8]
        )


def test_rand_flip_probability_and_effect(rng):
    s = make_sample(rng)
    # prob=1 -> always flips, image and label together
    out = rand_flip(s, axis=0, prob=1.0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out["image"], s["image"][::-1])
    np.testing.assert_array_equal(out["label"], s["label"][::-1])
    # prob=0 -> never
    out = rand_flip(s, axis=0, prob=0.0, rng=np.random.default_rng(0))
    assert out is s


def test_rand_rotate90(rng):
    s = make_sample(rng)
    gen = np.random.default_rng(2)
    out = rand_rotate90(s, prob=1.0, max_k=3, rng=gen)
    assert out["image"].shape[2:] == s["image"].shape[2:]
    ks = set()
    for seed in range(50):
        g = np.random.default_rng(seed)
        g.random()  # consume the prob draw
        ks.add(int(g.integers(1, 4)))
    assert ks == {1, 2, 3}


def test_rand_shift_intensity(rng):
    s = make_sample(rng)
    out = rand_shift_intensity(s, offsets=0.1, prob=1.0, rng=np.random.default_rng(1))
    delta = out["image"] - s["image"]
    assert np.allclose(delta, delta.ravel()[0])
    assert abs(delta.ravel()[0]) <= 0.1
    # label untouched
    np.testing.assert_array_equal(out["label"], s["label"])
