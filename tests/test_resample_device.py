"""Device-side resample parity vs the host `respace` (Spacingd contract).

VERDICT round-2 item 4: the north-star names a device resample kernel; it
must match `medseg.data.transforms.respace` (itself torch-grid_sample
cross-checked in tests/test_spacing_golden_torch.py) on the golden affine
cases — axis-aligned (separable MXU path), negative-zoom, and oblique
(gather path), image trilinear + label nearest, plus the fused intensity
window epilogue.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from medseg.data.transforms import respace, scale_intensity_range
from medseg.ops.resample import affine_resample_device, respace_device


def _host_device_case(rng, affine, shape=(10, 12, 8), mode="trilinear", channels=0):
    data = rng.normal(size=shape + ((channels,) if channels else ())).astype(np.float32)
    if mode == "nearest":
        data = np.round(data * 3).astype(np.float32)
    sample = {"image": data, "image_affine": np.asarray(affine, np.float64)}
    ref = respace(dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=(mode,))
    got = respace_device(dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=(mode,))
    assert np.shape(got["image"]) == np.shape(ref["image"])
    np.testing.assert_allclose(got["image_affine"], ref["image_affine"], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(got["image"]), ref["image"], rtol=2e-4, atol=2e-4
    )


def test_axis_aligned_trilinear(rng):
    _host_device_case(rng, np.diag([1.5, 0.8, 2.0, 1.0]))


def test_axis_aligned_channels(rng):
    _host_device_case(rng, np.diag([1.5, 0.8, 2.0, 1.0]), channels=3)


def test_axis_aligned_nearest(rng):
    _host_device_case(rng, np.diag([1.5, 0.8, 2.0, 1.0]), mode="nearest")


def test_negative_zoom(rng):
    aff = np.diag([-1.4, 1.1, 0.7, 1.0])
    aff[:3, 3] = [4.0, -2.0, 1.0]
    _host_device_case(rng, aff)


def test_oblique_affine_gather_path(rng):
    theta = 0.3
    rot = np.eye(4)
    rot[0, 0] = np.cos(theta) * 1.3
    rot[0, 1] = -np.sin(theta)
    rot[1, 0] = np.sin(theta)
    rot[1, 1] = np.cos(theta) * 0.9
    rot[2, 2] = 1.7
    _host_device_case(rng, rot)
    _host_device_case(rng, rot, mode="nearest")


def test_label_nearest_pair(rng):
    data = rng.normal(size=(10, 12, 8)).astype(np.float32)
    label = rng.integers(0, 4, size=(10, 12, 8)).astype(np.float32)
    aff = np.diag([1.5, 0.8, 2.0, 1.0])
    sample = {
        "image": data, "image_affine": aff.copy(),
        "label": label, "label_affine": aff.copy(),
    }
    ref = respace(dict(sample), (1.0, 1.0, 1.0))
    got = respace_device(dict(sample), (1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(got["label"]), ref["label"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["image"]), ref["image"], rtol=2e-4, atol=2e-4
    )


def test_fused_intensity_window(rng):
    """window epilogue == host ScaleIntensityRanged after host respace."""
    data = (rng.normal(size=(10, 12, 8)) * 200).astype(np.float32)
    aff = np.diag([1.5, 0.8, 2.0, 1.0])
    sample = {"image": data, "image_affine": aff.copy()}
    ref = respace(dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",))
    ref_img = scale_intensity_range(ref, -175.0, 250.0, 0.0, 1.0, clip=True)["image"]
    got = respace_device(
        dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",),
        window=(-175.0, 250.0, 0.0, 1.0, True),
    )
    np.testing.assert_allclose(np.asarray(got["image"]), ref_img, rtol=2e-4, atol=2e-4)


def test_identity_passthrough_with_window(rng):
    data = (rng.normal(size=(6, 6, 6)) * 100).astype(np.float32)
    sample = {"image": data, "image_affine": np.eye(4)}
    got = respace_device(
        dict(sample), (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",),
        window=(-175.0, 250.0, 0.0, 1.0, True),
    )
    ref = scale_intensity_range({"image": data}, -175.0, 250.0, 0.0, 1.0, clip=True)["image"]
    np.testing.assert_allclose(np.asarray(got["image"]), ref, rtol=1e-5, atol=1e-5)


def test_device_val_pipeline_matches_host(rng, tmp_path):
    """End-to-end: the device CT validation chain (respace+window fused,
    device orient, device foreground crop) matches the host chain on a
    synthetic NIfTI with an anisotropic affine."""
    from medseg.config import DataConfig
    from medseg.data.nifti import write_nifti
    from medseg.data.pipelines import ct_val_transforms, ct_val_transforms_device

    data = (rng.normal(size=(14, 12, 10)) * 150).astype(np.float32)
    data[4:9, 3:8, 2:7] += 400.0  # foreground blob for CropForeground
    aff = np.diag([1.5, 0.8, 2.0, 1.0])
    aff[:3, 3] = [3.0, -1.0, 2.0]
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, data, aff)

    cfg = DataConfig(crop_foreground=True)
    host = ct_val_transforms(cfg)({"image": path})
    dev = ct_val_transforms_device(cfg)({"image": path})
    assert np.shape(dev["image"]) == np.shape(host["image"])
    np.testing.assert_allclose(dev["image_affine"], host["image_affine"], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dev["image"]), host["image"], rtol=3e-4, atol=3e-4
    )


def test_device_mri_pipeline_matches_host(rng, tmp_path):
    from medseg.config import DataConfig
    from medseg.data.nifti import write_nifti
    from medseg.data.pipelines import mri_val_transforms, mri_val_transforms_device

    data = rng.normal(size=(14, 12, 10, 4)).astype(np.float32)
    data[data < -0.5] = 0.0  # nonzero mask exercise
    lab = rng.integers(0, 4, size=(14, 12, 10)).astype(np.float32)
    aff = np.diag([1.3, 0.9, 1.1, 1.0])
    img_path = str(tmp_path / "img.nii.gz")
    lab_path = str(tmp_path / "lab.nii.gz")
    write_nifti(img_path, data, aff)
    write_nifti(lab_path, lab, aff)

    cfg = DataConfig(task="mri", crop_foreground=False)
    sample = {"image": img_path, "label": lab_path}
    host = mri_val_transforms(cfg)(dict(sample))
    dev = mri_val_transforms_device(cfg)(dict(sample))
    np.testing.assert_allclose(
        np.asarray(dev["image"]), host["image"], rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(dev["label"]), host["label"], atol=1e-5)
