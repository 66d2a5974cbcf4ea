"""Device-side augmentation tests: determinism, probability behavior,
image/label consistency, host-semantics equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from medseg.ops.augment import augment_batch, scale_intensity_range_device


def make_batch(rng, b=4, s=8):
    img = jnp.asarray(rng.normal(size=(b, s, s, s, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 2, size=(b, s, s, s, 1)).astype(np.float32))
    return img, lab


def test_deterministic_per_key(rng):
    img, lab = make_batch(rng)
    a1 = augment_batch(jax.random.key(7), img, lab)
    a2 = augment_batch(jax.random.key(7), img, lab)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    a3 = augment_batch(jax.random.key(8), img, lab)
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(a3[0]))


def test_prob_zero_identity(rng):
    img, lab = make_batch(rng)
    out_img, out_lab = augment_batch(
        jax.random.key(0), img, lab, flip_prob=0.0, rot_prob=0.0, shift_prob=0.0
    )
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_prob_one_flips_all_axes(rng):
    img, lab = make_batch(rng, b=2)
    out_img, out_lab = augment_batch(
        jax.random.key(0), img, lab, flip_prob=1.0, rot_prob=0.0, shift_prob=0.0
    )
    expected = np.asarray(img)[:, ::-1, ::-1, ::-1]
    np.testing.assert_array_equal(np.asarray(out_img), expected)
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab)[:, ::-1, ::-1, ::-1])


def test_shift_applies_to_image_only(rng):
    img, lab = make_batch(rng, b=8)
    out_img, out_lab = augment_batch(
        jax.random.key(3), img, lab, flip_prob=0.0, rot_prob=0.0, shift_prob=1.0
    )
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))
    deltas = np.asarray(out_img) - np.asarray(img)
    for b in range(8):
        d = deltas[b]
        # constant shift per sample (up to fp32 rounding of x + shift)
        assert np.allclose(d, d.ravel()[0], atol=1e-5)
        assert abs(d.ravel()[0]) <= 0.1 + 1e-6
    # per-sample keys -> different shifts
    assert len({round(float(deltas[b].ravel()[0]), 6) for b in range(8)}) > 1


def test_label_geometry_follows_image(rng):
    """Any geometric aug must transform image and label identically."""
    img = jnp.asarray(np.arange(4 * 8 * 8 * 8, dtype=np.float32).reshape(4, 8, 8, 8, 1))
    out_img, out_lab = augment_batch(
        jax.random.key(11), img, img, flip_prob=0.5, rot_prob=0.5, shift_prob=0.0
    )
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out_lab))


def test_scale_intensity_device_matches_host():
    from medseg.data.transforms import scale_intensity_range

    x = np.array([-500.0, -175.0, 37.5, 250.0, 1000.0], np.float32).reshape(1, 5, 1, 1)
    host = scale_intensity_range({"image": x})["image"]
    dev = np.asarray(scale_intensity_range_device(jnp.asarray(x)))
    np.testing.assert_allclose(dev, host, atol=1e-6)
