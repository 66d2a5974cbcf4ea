"""Spacingd cross-check against torch ``grid_sample`` — MONAI's own backend.

MONAI 0.6 ``Spacing`` (the reference call site `unetr_segmentation_3d.py:
326-330`) resamples through torch ``affine_grid``/``grid_sample``
(align_corners=False, padding_mode="border"). SURVEY.md §7 names its
output-shape/align-corners semantics THE Dice-parity risk, and the round-1
verdict flagged that our tests only compared against our own code. Here the
interpolation engine is torch's: we build the normalized sampling grid from
the SAME voxel->voxel affine MONAI uses and let ``grid_sample`` produce the
reference values. The shape/offset rule is additionally pinned by literal
examples of the MONAI ``compute_shape_offset`` corner algorithm.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from medseg.data.transforms import (
    _compute_shape_offset,
    _zoom_affine,
    orient_ras,
    respace,
)


def torch_resample(data, affine, pixdim, mode):
    """Reference resample: MONAI's affine math + torch grid_sample.

    data: (X, Y, Z) or (X, Y, Z, C) numpy; returns same layout.
    """
    squeeze = data.ndim == 3
    vol = data[..., None] if squeeze else data
    x, y, z, c = vol.shape
    affine = np.asarray(affine, dtype=np.float64)
    new_affine = _zoom_affine(affine, np.asarray(pixdim, dtype=np.float64))
    new_shape, offset = _compute_shape_offset((x, y, z), affine, new_affine)
    new_affine[:3, 3] = offset
    m = np.linalg.inv(affine) @ new_affine  # dst voxel -> src voxel

    # destination voxel grid -> source voxel coords
    grid_v = np.stack(
        np.meshgrid(*[np.arange(s) for s in new_shape], indexing="ij"), axis=-1
    ).astype(np.float64)
    src = grid_v @ m[:3, :3].T + m[:3, 3]
    # normalized coords, align_corners=False: n = (2v + 1)/size - 1
    sizes = np.array([x, y, z], dtype=np.float64)
    norm = (2.0 * src + 1.0) / sizes - 1.0
    # grid_sample expects the grid's last axis ordered (W, H, D) = reversed.
    # MONAI 0.6 Spacing resamples at dtype=np.float64 — keep the grid double
    # so half-boundary nearest rounding matches.
    grid_t = torch.from_numpy(norm[..., ::-1].copy())[None]
    inp = torch.from_numpy(
        np.ascontiguousarray(vol.transpose(3, 0, 1, 2), dtype=np.float64)
    )[None]
    out = F.grid_sample(
        inp,
        grid_t,
        mode="bilinear" if mode == "trilinear" else mode,
        padding_mode="border",
        align_corners=False,
    )
    res = out[0].numpy().transpose(1, 2, 3, 0)
    return (res[..., 0] if squeeze else res), new_shape, new_affine


def _run_case(rng, affine, shape=(10, 12, 8), mode="trilinear", channels=0):
    data = rng.normal(size=shape + ((channels,) if channels else ())).astype(
        np.float32
    )
    if mode == "nearest":
        data = np.round(data * 3).astype(np.float32)
    ref, ref_shape, ref_affine = torch_resample(data, affine, (1.0, 1.0, 1.0), mode)
    sample = {"image": data, "image_affine": np.asarray(affine, np.float64)}
    got = respace(sample, (1.0, 1.0, 1.0), keys=("image",), modes=(mode,))
    assert got["image"].shape[:3] == tuple(ref_shape), (
        got["image"].shape,
        ref_shape,
    )
    np.testing.assert_allclose(got["image_affine"], ref_affine, atol=1e-9)
    np.testing.assert_allclose(got["image"], ref, rtol=1e-4, atol=1e-4)


def test_shape_rule_matches_monai_corner_algorithm():
    """10 voxels at 1.5mm -> round((10-1)*1.5 + 1) = round(14.5) = 14 (banker's),
    NOT round(10*1.5) = 15; 41 voxels at 3.0mm -> round(40*3+1) = 121."""
    aff = np.diag([1.5, 1.5, 1.5, 1.0])
    shape, offset = _compute_shape_offset((10, 10, 10), aff, np.eye(4))
    assert tuple(shape) == (14, 14, 14)
    np.testing.assert_allclose(offset, 0.0)
    aff = np.diag([3.0, 0.76, 0.76, 1.0])
    shape, _ = _compute_shape_offset((41, 512, 512), aff, np.eye(4))
    assert tuple(shape) == tuple(
        int(np.round((s - 1) * z + 1))
        for s, z in [(41, 3.0), (512, 0.76), (512, 0.76)]
    )


def test_spacing_matches_torch_axis_aligned(rng):
    aff = np.diag([1.5, 0.8, 2.0, 1.0])
    aff[:3, 3] = [-10.0, 4.0, 7.5]
    _run_case(rng, aff)


def test_spacing_matches_torch_negative_directions(rng):
    aff = np.diag([-1.5, 0.8, -2.0, 1.0])
    aff[:3, 3] = [20.0, -3.0, 11.0]
    _run_case(rng, aff)


def test_spacing_matches_torch_oblique(rng):
    th = 0.25
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    aff = np.eye(4)
    aff[:3, :3] = rot @ np.diag([1.3, 0.9, 1.7])
    aff[:3, 3] = [5.0, -2.0, 1.0]
    _run_case(rng, aff)


def test_spacing_matches_torch_nearest_label(rng):
    aff = np.diag([1.7, 1.7, 4.0, 1.0])
    _run_case(rng, aff, mode="nearest")


def test_spacing_matches_torch_multichannel(rng):
    aff = np.diag([2.0, 1.2, 0.7, 1.0])
    _run_case(rng, aff, channels=4)


def test_spacing_then_orient_matches_reference_order(rng):
    """The reference applies Spacingd BEFORE Orientationd (seg :326-331);
    on a flipped affine the respaced volume must still orient to RAS with a
    positive-diagonal affine."""
    aff = np.diag([-1.5, 1.0, 2.0, 1.0])
    aff[:3, 3] = [12.0, 0.0, 0.0]
    data = rng.normal(size=(9, 10, 11)).astype(np.float32)
    s = {"image": data, "image_affine": aff}
    s = respace(s, (1.0, 1.0, 1.0), keys=("image",), modes=("trilinear",))
    s = orient_ras(s, keys=("image",))
    d = np.diag(s["image_affine"])[:3]
    assert (d > 0).all()
    np.testing.assert_allclose(np.abs(d), 1.0)


def test_io_orientation_matches_nibabel_algorithm():
    """Literal nibabel ``io_orientation`` cases, incl. an oblique affine where
    the in-order row-zeroing rule differs from a global greedy assignment."""
    from medseg.data.transforms import _io_orientation

    # RAS identity
    np.testing.assert_array_equal(
        _io_orientation(np.eye(4)), [[0, 1], [1, 1], [2, 1]]
    )
    # LPS
    aff = np.diag([-1.0, -1.0, 1.0, 1.0])
    np.testing.assert_array_equal(
        _io_orientation(aff), [[0, -1], [1, -1], [2, 1]]
    )
    # permuted: data axes (z, x, y)
    aff = np.zeros((4, 4))
    aff[2, 0] = 1.0  # axis 0 -> S
    aff[0, 1] = -1.0  # axis 1 -> L
    aff[1, 2] = 1.0  # axis 2 -> A
    aff[3, 3] = 1.0
    np.testing.assert_array_equal(
        _io_orientation(aff), [[2, 1], [0, -1], [1, 1]]
    )
    # oblique: axis 0 nearly diagonal between world 0 and 1 — nibabel assigns
    # in input-axis order and removes the taken row
    aff = np.eye(4)
    aff[:3, 0] = [0.9, 0.9, 0.0]
    aff[:3, 1] = [1.0, 0.0, 0.0]
    aff[:3, 2] = [0.0, 0.0, 1.0]
    ornt = _io_orientation(aff)
    taken = {int(o) for o, _ in ornt}
    assert taken == {0, 1, 2}
    assert int(ornt[2, 0]) == 2 and int(ornt[2, 1]) == 1
