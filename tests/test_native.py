"""Native (C++/OpenMP) host-runtime parity tests vs the numpy reference paths."""

import gzip

import numpy as np
import pytest

from medseg import native
from medseg.data import transforms as T

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++/zlib)"
)


def test_inflate_gzip_roundtrip(rng):
    raw = rng.integers(0, 255, size=100_000, dtype=np.uint8).tobytes()
    assert native.inflate_gzip(gzip.compress(raw), len(raw)) == raw


def test_trilinear_matches_numpy(rng):
    src = rng.normal(size=(9, 11, 7, 2)).astype(np.float32)
    # dst voxel -> src voxel map: scale + offset
    m = np.array(
        [[0.8, 0.0, 0.0, 0.3], [0.0, 1.3, 0.0, -0.2], [0.0, 0.0, 0.6, 0.1]]
    )
    out_shape = (10, 8, 12)
    got = native.trilinear_resample(src, m, out_shape)
    grid = np.stack(
        np.meshgrid(*[np.arange(s) for s in out_shape], indexing="ij"), axis=-1
    ).astype(np.float64)
    coords = grid @ m[:, :3].T + m[:, 3]
    expected = T._trilinear_sample(src, coords)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_nearest_matches_numpy(rng):
    src = rng.integers(0, 5, size=(9, 11, 7, 1)).astype(np.float32)
    m = np.array(
        [[0.77, 0.0, 0.0, 0.21], [0.0, 1.31, 0.0, -0.2], [0.0, 0.0, 0.63, 0.1]]
    )
    out_shape = (11, 8, 10)
    got = native.nearest_resample(src, m, out_shape)
    vals = np.unique(got)
    assert set(vals).issubset(set(np.unique(src)))


def test_scale_intensity_matches_numpy(rng):
    data = rng.normal(0, 300, size=1000).astype(np.float32)
    expected = np.clip((data + 175.0) / 425.0, 0.0, 1.0)
    buf = data.copy()
    assert native.scale_intensity(buf, -175.0, 250.0, 0.0, 1.0, True)
    np.testing.assert_allclose(buf, expected, rtol=1e-5, atol=1e-6)


def test_znorm_matches_numpy(rng):
    data = np.zeros(1000, np.float32)
    data[100:700] = rng.normal(5, 2, size=600).astype(np.float32)
    ref = T._znorm(data.copy(), nonzero=True)
    buf = data.copy()
    assert native.znorm_nonzero(buf)
    np.testing.assert_allclose(buf, ref, rtol=1e-4, atol=1e-5)


def test_foreground_bbox(rng):
    x = np.zeros((20, 22, 24), np.float32)
    x[3:9, 5:10, 7:15] = 1.0
    bbox = native.foreground_bbox(x)
    np.testing.assert_array_equal(bbox, [3, 9, 5, 10, 7, 15])
    assert native.foreground_bbox(np.zeros((4, 4, 4), np.float32)) is None


def test_respace_uses_native_and_matches(rng):
    """End-to-end respace parity: native path vs forced-numpy path."""
    img = rng.normal(size=(16, 12, 10)).astype(np.float32)[..., None]
    affine = np.diag([0.7, 1.4, 2.0, 1.0])
    s = {"image": img, "image_affine": affine}
    native_out = T.respace(dict(s), keys=["image"], modes=["trilinear"])

    import unittest.mock as mock

    with mock.patch.object(T, "_native_resample", lambda *a, **k: None):
        numpy_out = T.respace(dict(s), keys=["image"], modes=["trilinear"])
    np.testing.assert_allclose(
        native_out["image"], numpy_out["image"], rtol=1e-4, atol=1e-5
    )
