"""Sliding-window inference tests.

Contract: MONAI 0.6 ``sliding_window_inference`` as used at
`/root/reference/unetr_segmentation_3d.py:109,143` (overlap 0.25, constant
blend) and `:694-695` (overlap 0.8); BASELINE config 4 adds gaussian blending.
Key invariant tested: for a voxel-wise predictor, windowed inference must
reproduce the direct whole-volume result exactly for any grid/blending —
blending weights cancel under normalization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.ops.sliding_window import (
    SlidingWindowSpec,
    compute_window_starts,
    constant_importance,
    gaussian_importance,
    sliding_window_inference,
)


def voxelwise_apply(params, windows):
    """A 1x1 'conv': logits = x @ W, pure voxel-wise function of input."""
    return jnp.einsum("bdhwc,ck->bdhwk", windows, params)


def test_window_starts_cover_and_clip():
    starts = compute_window_starts((10, 10, 10), (4, 4, 4), overlap=0.25)
    per_dim = np.unique(starts[:, 0])
    np.testing.assert_array_equal(per_dim, [0, 3, 6])
    # all windows in-bounds
    assert starts.max() <= 6
    # exact-fit dim: one window
    starts = compute_window_starts((4, 4, 4), (4, 4, 4), overlap=0.25)
    assert starts.shape == (1, 3)


def test_window_starts_full_coverage():
    for shape, roi, ov in [((13, 9, 17), (4, 4, 4), 0.5), ((20, 20, 20), (8, 8, 8), 0.8)]:
        starts = compute_window_starts(shape, roi, ov)
        covered = np.zeros(shape, bool)
        for s in starts:
            covered[s[0] : s[0] + roi[0], s[1] : s[1] + roi[1], s[2] : s[2] + roi[2]] = True
        assert covered.all()


def test_gaussian_importance_properties():
    w = gaussian_importance((8, 8, 8))
    assert w.shape == (8, 8, 8)
    assert w.max() == pytest.approx(1.0)
    assert (w > 0).all()
    # symmetric and peaked at the center
    np.testing.assert_allclose(w, w[::-1, ::-1, ::-1], rtol=1e-6)
    assert w[3, 3, 3] == w.max() or w[4, 4, 4] == w.max()


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
@pytest.mark.parametrize("overlap", [0.25, 0.5, 0.8])
def test_voxelwise_predictor_exact(rng, mode, overlap):
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=overlap, sw_batch=4, mode=mode)
    out = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    expected = vol @ w
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_volume_smaller_than_roi_pads_and_crops(rng):
    vol = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    w = rng.normal(size=(2, 3)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.25)
    out = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 3, spec)
    assert out.shape == (5, 6, 7, 3)
    np.testing.assert_allclose(np.asarray(out), vol @ w, rtol=1e-4, atol=1e-4)


def test_batch_dim_passthrough(rng):
    vol = rng.normal(size=(1, 12, 12, 12, 2)).astype(np.float32)
    w = rng.normal(size=(2, 3)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8))
    out = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 3, spec)
    assert out.shape == (1, 12, 12, 12, 3)


def test_bucketing_preserves_result(rng):
    vol = rng.normal(size=(19, 13, 11, 2)).astype(np.float32)
    w = rng.normal(size=(2, 4)).astype(np.float32)
    out1 = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 4, SlidingWindowSpec(roi=(8, 8, 8))
    )
    out2 = sliding_window_inference(
        jnp.asarray(w),
        jnp.asarray(vol),
        voxelwise_apply,
        4,
        SlidingWindowSpec(roi=(8, 8, 8), bucket_multiple=16),
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-4)


def test_real_conv_model_window_batching_invariance(rng):
    """Result must not depend on sw_batch (windows are independent)."""
    vol = rng.normal(size=(16, 16, 16, 1)).astype(np.float32)
    w = rng.normal(size=(1, 2)).astype(np.float32)
    outs = []
    for swb in (1, 3, 8):
        spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=swb)
        outs.append(
            np.asarray(
                sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 2, spec)
            )
        )
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
def test_channels_first_layout_matches_ndhwc(rng, mode):
    """out_layout="ndchw": channel-first apply_fn + accumulator produce the
    identical blended volume (the v3 Pallas fast path's layout)."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode=mode)

    def apply_cf(params, windows):
        return jnp.einsum("bdhwc,ck->bdkhw", windows, params)

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), apply_cf, 5, spec, out_layout="ndchw"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
@pytest.mark.parametrize("prepad", [False, True])
def test_flatk_layout_matches_ndhwc(rng, mode, prepad):
    """out_layout="flatk": the tile-aligned flat (D, H, W*K16) accumulator
    blends identically to the NDHWC reference, with K- or pre-padded-K16
    logits (the v3 fast path emits all 16 out-head channels, pad channels
    carrying bias — they must be cropped after blending, not before)."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode=mode)

    if prepad:
        def apply_k(params, windows):
            out = jnp.einsum("bdhwc,ck->bdhwk", windows, params)
            return jnp.pad(out, [(0, 0)] * 4 + [(0, 3)], constant_values=7.5)
    else:
        apply_k = voxelwise_apply

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), apply_k, 5, spec, out_layout="flatk"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flatk_bf16_logits_close(rng):
    """bf16 logits through the flat-K16 scatter stay within bf16 tolerance of
    the fp32 blend (serving-path configuration)."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode="gaussian")

    def apply_bf16(params, windows):
        return jnp.einsum("bdhwc,ck->bdhwk", windows, params).astype(jnp.bfloat16)

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), apply_bf16, 5, spec, out_layout="flatk"
    )
    scale = float(np.max(np.abs(np.asarray(ref))))
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(ref)))) < 0.02 * scale


def test_flatk_apply_takes_weight(rng):
    """apply_takes_weight: the model receives the blend weight (importance *
    1/count * validity) and emits pre-weighted logits (the Pallas serving
    path folds this into the out-head kernel epilogue) — identical blend."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode="gaussian")

    def apply_weighted(params, windows, wgt):
        return jnp.einsum("bdhwc,ck->bdhwk", windows, params) * wgt

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), apply_weighted, 5, spec,
        out_layout="flatk", apply_takes_weight=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flatk_bf16_accumulator_close(rng):
    """acc_dtype="bf16" (serving default): blended volume within bf16
    tolerance of the fp32-accumulated reference."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode="gaussian")
    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec,
        out_layout="flatk", acc_dtype="bf16",
    )
    assert got.dtype == jnp.float32
    scale = float(np.max(np.abs(np.asarray(ref))))
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(ref)))) < 0.03 * scale


def test_ppk_layout_matches_ndhwc(rng):
    """out_layout="ppk": parity-plane windows + accumulator blend identically
    to the NDHWC reference (one deinterleave per volume)."""
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, sw_batch=4, mode="gaussian")
    k16 = 8

    def apply_pp(params, windows, wgt):
        lg = jnp.einsum("bdhwc,ck->bdhwk", windows, params) * wgt
        lg = jnp.pad(lg, [(0, 0)] * 4 + [(0, k16 - lg.shape[-1])])
        b, rd, rh, rw, _ = lg.shape
        g = lg.reshape(b, rd, rh // 2, 2, rw // 2, 2, k16)
        return g.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, rd, 4, rh // 2, (rw // 2) * k16
        )

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec
    )
    got = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), apply_pp, 5, spec,
        out_layout="ppk", apply_takes_weight=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ppk_with_v3_fallback_model(rng):
    """Round-2 advisor regression: when fast_apply_v3 cannot engage its
    kernels (CPU / unsupported shape) its flax fallback must still emit the
    REQUESTED ppk window form so the ppk scatter consumes it."""
    from medseg.kernels.unetr_of import fast_apply_v3
    from medseg.models.unetr import UNETR
    from medseg.ops.sliding_window import ppk_supported

    model = UNETR(
        in_channels=1, out_channels=3, img_size=(32, 32, 32), feature_size=4,
        hidden_size=24, mlp_dim=48, num_heads=4, num_layers=4, patch_size=16,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    vol = rng.normal(size=(40, 36, 32, 1)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(32, 32, 32), overlap=0.25, sw_batch=2)
    assert ppk_supported(vol.shape[:3], spec)

    def apply_plain(p, windows):
        return model.apply(p, windows, return_encoder_features=False)

    def apply_pp(p, windows, wgt):
        return fast_apply_v3(model, p, windows, flat_k16=True, out_scale=wgt, pp=True)

    ref = sliding_window_inference(params, jnp.asarray(vol), apply_plain, 3, spec)
    got = sliding_window_inference(
        params, jnp.asarray(vol), apply_pp, 3, spec,
        out_layout="ppk", apply_takes_weight=True,
    )
    scale = float(np.max(np.abs(np.asarray(ref))))
    # fallback casts logits to bf16 (the flat_k16 contract) -> bf16 tolerance
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(ref)))) < 0.02 * scale


def test_validator_gates_fast_path_on_unsupported_shapes(rng):
    """Validator(use_fast_path=True) with a window shape the v3 kernels do
    not support must route to the plain NDHWC path and still validate."""
    from medseg.engine.evaluate import Validator
    from medseg.models.unetr import UNETR

    model = UNETR(
        in_channels=1, out_channels=2, img_size=(32, 32, 32), feature_size=4,
        hidden_size=24, mlp_dim=48, num_heads=4, num_layers=4, patch_size=16,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    spec = SlidingWindowSpec(roi=(32, 32, 32), overlap=0.25, sw_batch=2)
    v = Validator(model, 2, "ct", spec, use_fast_path=True)
    assert v._out_layout == "ndhwc"  # gated: feature_size 4 unsupported
    image = rng.normal(size=(1, 40, 36, 32, 1)).astype(np.float32)
    label = (image[0, ..., 0] > 0).astype(np.int32)
    res = v(params, [{"image": jnp.asarray(image), "label": jnp.asarray(label)}])
    assert np.isfinite(res.mean_dice)
