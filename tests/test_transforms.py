"""Deterministic preprocessing transform tests (MONAI 0.6 contracts)."""

import numpy as np
import pytest

from medseg.data import transforms as T
from medseg.data.nifti import write_nifti


def test_ensure_channel():
    s = {"image": np.zeros((4, 5, 6)), "label": np.zeros((4, 5, 6, 2))}
    out = T.ensure_channel(s)
    assert out["image"].shape == (4, 5, 6, 1)
    assert out["label"].shape == (4, 5, 6, 2)


def test_orient_ras_identity():
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    s = {"image": np.arange(24.0).reshape(2, 3, 4, 1), "image_affine": affine}
    out = T.orient_ras(s, keys=["image"])
    np.testing.assert_array_equal(out["image"], s["image"])
    np.testing.assert_allclose(out["image_affine"], affine)


def test_orient_ras_flip():
    """LAS -> RAS: X axis flipped; world coordinates of voxels preserved."""
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])
    affine[0, 3] = 3.0  # origin at x=3, stepping -1 per voxel
    data = np.arange(4 * 2 * 2, dtype=np.float64).reshape(4, 2, 2)
    s = {"image": data[..., None], "image_affine": affine}
    out = T.orient_ras(s, keys=["image"])
    np.testing.assert_array_equal(out["image"][..., 0], data[::-1])
    # voxel (0,0,0) of the new array = voxel (3,0,0) of the old = world x 0
    new_affine = out["image_affine"]
    np.testing.assert_allclose(new_affine @ [0, 0, 0, 1], [0, 0, 0, 1])
    np.testing.assert_allclose(new_affine[:3, :3], np.eye(3))


def test_orient_ras_permutation():
    """Axes stored as (S, R, A) -> permuted to (R, A, S)."""
    affine = np.zeros((4, 4))
    affine[3, 3] = 1
    affine[2, 0] = 1.0  # data axis 0 -> world z (S)
    affine[0, 1] = 1.0  # data axis 1 -> world x (R)
    affine[1, 2] = 1.0  # data axis 2 -> world y (A)
    data = np.random.default_rng(0).normal(size=(3, 4, 5, 1))
    s = {"image": data, "image_affine": affine}
    out = T.orient_ras(s, keys=["image"])
    assert out["image"].shape == (4, 5, 3, 1)
    np.testing.assert_allclose(out["image_affine"][:3, :3], np.eye(3), atol=1e-12)
    # world position of a probe voxel is preserved
    probe_old = np.array([1, 2, 3, 1])
    world = affine @ probe_old
    new_idx = np.linalg.solve(out["image_affine"], world)
    np.testing.assert_allclose(
        out["image"][tuple(np.round(new_idx[:3]).astype(int)) + (0,)],
        data[1, 2, 3, 0],
    )


def test_respace_downsample_linear_ramp():
    """A linear-in-x ramp stays linear under trilinear respacing, and the
    output grid covers the same physical extent at the new spacing."""
    x = np.arange(16, dtype=np.float32)
    data = np.broadcast_to(x[:, None, None], (16, 8, 8)).copy()[..., None]
    affine = np.diag([0.5, 1.0, 1.0, 1.0])  # 0.5mm in x
    s = {"image": data, "image_affine": affine}
    out = T.respace(s, pixdim=(1.0, 1.0, 1.0), keys=["image"], modes=["trilinear"])
    assert out["image"].shape == (8, 8, 8, 1)
    np.testing.assert_allclose(out["image_affine"][:3, :3], np.eye(3))
    # new voxel i sits at old voxel 2i -> value 2i
    np.testing.assert_allclose(
        out["image"][:, 0, 0, 0], 2.0 * np.arange(8), rtol=1e-5
    )


def test_respace_nearest_keeps_integer_labels():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4, size=(10, 10, 10)).astype(np.float32)[..., None]
    affine = np.diag([0.7, 1.3, 1.0, 1.0])
    s = {"label": data, "label_affine": affine}
    out = T.respace(s, pixdim=(1.0, 1.0, 1.0), keys=["label"], modes=["nearest"])
    vals = np.unique(out["label"])
    assert set(vals).issubset({0.0, 1.0, 2.0, 3.0})


def test_respace_noop_when_already_isotropic():
    data = np.zeros((5, 5, 5, 1), np.float32)
    s = {"image": data, "image_affine": np.eye(4)}
    out = T.respace(s, keys=["image"], modes=["trilinear"])
    assert out["image"] is data  # untouched


def test_scale_intensity_range():
    img = np.array([[-500.0, -175.0, 37.5, 250.0, 1000.0]], np.float32).reshape(1, 5, 1, 1)
    out = T.scale_intensity_range({"image": img})
    np.testing.assert_allclose(
        out["image"].ravel(), [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6
    )


def test_normalize_intensity_nonzero_channelwise(rng):
    img = np.zeros((4, 4, 4, 2), np.float32)
    img[1:3, :, :, 0] = rng.normal(5.0, 2.0, size=(2, 4, 4))
    img[:, 1:2, :, 1] = rng.normal(-3.0, 1.0, size=(4, 1, 4))
    out = T.normalize_intensity({"image": img})
    for c in range(2):
        ch = out["image"][..., c]
        nz = ch[img[..., c] != 0]
        assert abs(nz.mean()) < 1e-5
        assert abs(nz.std() - 1.0) < 1e-4
        # zeros untouched
        np.testing.assert_array_equal(ch[img[..., c] == 0], 0.0)


def test_crop_foreground():
    img = np.zeros((10, 10, 10, 1), np.float32)
    img[2:5, 3:7, 4:6] = 1.0
    lab = np.ones_like(img)
    out = T.crop_foreground({"image": img, "label": lab})
    assert out["image"].shape == (3, 4, 2, 1)
    assert out["label"].shape == (3, 4, 2, 1)
    np.testing.assert_array_equal(out["foreground_start"], [2, 3, 4])


def test_brats_to_multichannel():
    lab = np.array([0, 1, 2, 3]).reshape(4, 1, 1)
    out = T.brats_to_multichannel({"label": lab[..., None]})
    m = out["label"]
    assert m.shape == (4, 1, 1, 4)
    np.testing.assert_array_equal(m[:, 0, 0, 0], [1, 0, 0, 0])  # background
    np.testing.assert_array_equal(m[:, 0, 0, 1], [0, 0, 1, 1])  # TC = 2|3
    np.testing.assert_array_equal(m[:, 0, 0, 2], [0, 1, 1, 1])  # WT = 1|2|3
    np.testing.assert_array_equal(m[:, 0, 0, 3], [0, 0, 0, 1])  # ET = 3


def test_full_ct_chain_on_synthetic_nifti(tmp_path, rng):
    """LoadImaged -> ... -> CropForeground, the reference CT val pipeline
    (`unetr_segmentation_3d.py:379-399`) end to end on a synthetic file."""
    img = rng.normal(50.0, 100.0, size=(12, 14, 10)).astype(np.float32)
    lab = (img > 100).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    ip, lp = str(tmp_path / "img.nii.gz"), str(tmp_path / "lab.nii.gz")
    write_nifti(ip, img, affine)
    write_nifti(lp, lab, affine)

    chain = T.Compose(
        [
            T.load,
            T.ensure_channel,
            lambda s: T.respace(s, (1.0, 1.0, 1.0)),
            T.orient_ras,
            T.scale_intensity_range,
            T.crop_foreground,
        ]
    )
    out = chain({"image": ip, "label": lp})
    assert out["image"].ndim == 4
    assert out["image"].shape == out["label"].shape
    assert out["image"].min() >= 0.0 and out["image"].max() <= 1.0
    assert out["image"].shape[0] >= 20  # respaced 2mm -> 1mm roughly doubles


def test_numpy_resample_fallback_warns(monkeypatch, caplog):
    """When medseg.native is unavailable the GIL-bound numpy resample path
    must announce itself (round-2 advisor: loader threads silently serialize
    without the C++ resampler)."""
    import logging

    import medseg.data.transforms as T2

    monkeypatch.setattr(T2, "_native_resample", lambda *a, **k: None)
    monkeypatch.setattr(T2, "_warned_numpy_resample", False)
    sample = {
        "image": np.random.default_rng(0).normal(size=(6, 7, 8)).astype(np.float32),
        "image_affine": np.diag([1.5, 1.0, 1.0, 1.0]),
    }
    with caplog.at_level(logging.WARNING, logger="medseg"):
        T2.respace(sample, (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",))
    assert any("numpy" in r.message for r in caplog.records)
