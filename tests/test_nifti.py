"""First-party NIfTI reader/writer tests (replaces NiBabel, SURVEY.md §2.4)."""

import gzip
import struct

import numpy as np
import pytest

from medseg.data.nifti import HEADER_SIZE, NiftiImage, read_nifti, write_nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_roundtrip(tmp_path, rng, suffix, dtype):
    data = (rng.random(size=(7, 6, 5)) * 100).astype(dtype)
    affine = np.array(
        [[2.0, 0, 0, -10], [0, 0.5, 0, 3], [0, 0, 1.5, 7], [0, 0, 0, 1]]
    )
    path = str(tmp_path / f"vol{suffix}")
    write_nifti(path, data, affine)
    img = read_nifti(path)
    np.testing.assert_array_equal(img.data, data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-6)
    np.testing.assert_allclose(img.spacing, [2.0, 0.5, 1.5], atol=1e-6)


def test_roundtrip_4d(tmp_path, rng):
    data = rng.normal(size=(4, 5, 6, 3)).astype(np.float32)
    path = str(tmp_path / "vol4d.nii.gz")
    write_nifti(path, data)
    img = read_nifti(path)
    np.testing.assert_array_equal(img.data, data)
    assert img.data.shape == (4, 5, 6, 3)


def test_scl_slope_inter_applied(tmp_path, rng):
    """Quantized volumes carry scl_slope/inter; reader must apply them."""
    data = rng.integers(0, 100, size=(3, 4, 5)).astype(np.int16)
    path = str(tmp_path / "scaled.nii")
    write_nifti(path, data)
    # patch slope/inter in the written header
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    struct.pack_into("<f", raw, 112, 2.5)  # scl_slope
    struct.pack_into("<f", raw, 116, -1.0)  # scl_inter
    with open(path, "wb") as f:
        f.write(raw)
    img = read_nifti(path)
    np.testing.assert_allclose(img.data, data.astype(np.float32) * 2.5 - 1.0)


def test_quaternion_affine_fallback(tmp_path, rng):
    """sform_code=0, qform set -> affine from the quaternion."""
    data = rng.normal(size=(3, 3, 3)).astype(np.float32)
    path = str(tmp_path / "q.nii")
    write_nifti(path, data)
    with open(path, "rb") as f:
        raw = bytearray(f.read())
    struct.pack_into("<h", raw, 252, 1)  # qform_code
    struct.pack_into("<h", raw, 254, 0)  # sform_code off
    # identity rotation (b=c=d=0), offset (1,2,3), pixdim (1,1,1)
    struct.pack_into("<6f", raw, 256, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0)
    struct.pack_into("<8f", raw, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    with open(path, "wb") as f:
        f.write(raw)
    img = read_nifti(path)
    expected = np.eye(4)
    expected[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(img.affine, expected, atol=1e-6)


def test_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.nii")
    with open(path, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError):
        read_nifti(path)


def test_fortran_order_on_disk(tmp_path):
    """NIfTI stores Fortran order; fastest-varying index is X."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "f.nii")
    write_nifti(path, data)
    with open(path, "rb") as f:
        raw = f.read()
    on_disk = np.frombuffer(raw, np.float32, count=24, offset=352)
    assert on_disk[0] == data[0, 0, 0]
    assert on_disk[1] == data[1, 0, 0]  # X varies fastest
