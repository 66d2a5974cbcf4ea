"""z-row deferred-overlap-add sliding-window engine parity tests.

The zrow walk (medseg/ops/swi_zrow.py) must blend identically to the
reference NDHWC scan-SWI engine for any supported grid — same MONAI 0.6
contract (`/root/reference/unetr_segmentation_3d.py:109,143,694-695`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.ops.sliding_window import SlidingWindowSpec, sliding_window_inference
from medseg.ops.swi_zrow import (
    _fold_plan,
    sliding_window_inference_zrow,
    zrow_supported,
)


def voxelwise_apply(params, windows):
    return jnp.einsum("bdhwc,ck->bdhwk", windows, params)


def make_apply_pp(params_unused, k: int, k16: int):
    """Wrap the voxelwise predictor into the ppk window contract:
    (B, rd, 4, rh/2, (rw/2)*K16) pre-weighted windows."""

    def apply_pp(params, windows, wgt):
        lg = jnp.einsum("bdhwc,ck->bdhwk", windows, params) * wgt
        lg = jnp.pad(lg, [(0, 0)] * 4 + [(0, k16 - k)])
        b, rd, rh, rw, _ = lg.shape
        g = lg.reshape(b, rd, rh // 2, 2, rw // 2, 2, k16)
        return g.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, rd, 4, rh // 2, (rw // 2) * k16
        )

    return apply_pp


def test_fold_plan_regular_and_clipped():
    # regular 50%-overlap grid: starts 0, 4, 8 width 8 over [0, 16)
    segs = _fold_plan([0, 4, 8], 8, 16)
    cover = {(s, s + ln): tuple(j for j, _ in cv) for s, ln, cv in segs}
    assert cover == {
        (0, 4): (0,), (4, 8): (0, 1), (8, 12): (1, 2), (12, 16): (2,),
    }
    # clipped final start (MONAI clips k*interval to dim-roi): 0, 4, 6
    segs = _fold_plan([0, 4, 6], 8, 14)
    total = sum(ln for _, ln, _ in segs)
    assert total == 14
    # every local offset in range
    for s, ln, cv in segs:
        for j, off in cv:
            assert 0 <= off and off + ln <= 8


@pytest.mark.parametrize(
    "shape,overlap,mode",
    [
        ((20, 18, 14, 3), 0.5, "gaussian"),
        ((20, 18, 14, 3), 0.25, "constant"),
        ((40, 36, 32, 1), 0.5, "gaussian"),  # includes exact-fit W dim
        ((8, 8, 8, 2), 0.25, "constant"),  # single window
    ],
)
def test_zrow_matches_ndhwc(rng, shape, overlap, mode):
    vol = rng.normal(size=shape).astype(np.float32)
    k = 5
    k16 = 8
    w = rng.normal(size=(shape[-1], k)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=overlap, mode=mode)
    assert zrow_supported(shape[:3], spec)
    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, k, spec)
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, k, k16), k, spec,
        acc_dtype="fp32",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_zrow_bf16_close(rng):
    vol = rng.normal(size=(20, 18, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, mode="gaussian")
    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec)
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, 5, 8), 5, spec,
        acc_dtype="bf16",
    )
    scale = float(np.max(np.abs(np.asarray(ref))))
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(ref)))) < 0.03 * scale


def test_zrow_headline_grid_structure():
    """The BASELINE config-4 grid (512x512x160, 96^3, 0.5) is zrow-supported
    and decomposes into the expected 10x10x3 structured walk."""
    from medseg.ops.sliding_window import per_dim_window_starts

    spec = SlidingWindowSpec(roi=(96, 96, 96), overlap=0.5, mode="gaussian")
    assert zrow_supported((512, 512, 160), spec)
    d, h, w = per_dim_window_starts((512, 512, 160), (96, 96, 96), 0.5)
    assert len(d) == 10 and len(h) == 10 and len(w) == 3
    assert list(w) == [0, 48, 64]


def test_zrow_with_v3_fallback_model(rng):
    """End-to-end with a real (tiny) UNETR through fast_apply_v3's ppk window
    form — the zrow engine consumes exactly the serving apply contract."""
    from medseg.kernels.unetr_of import fast_apply_v3
    from medseg.models.unetr import UNETR

    model = UNETR(
        in_channels=1, out_channels=3, img_size=(32, 32, 32), feature_size=4,
        hidden_size=24, mlp_dim=48, num_heads=4, num_layers=4, patch_size=16,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    vol = rng.normal(size=(40, 36, 32, 1)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(32, 32, 32), overlap=0.25)

    def apply_plain(p, windows):
        return model.apply(p, windows, return_encoder_features=False)

    def apply_pp(p, windows, wgt):
        return fast_apply_v3(model, p, windows, flat_k16=True, out_scale=wgt, pp=True)

    ref = sliding_window_inference(params, jnp.asarray(vol), apply_plain, 3, spec)
    got = sliding_window_inference_zrow(
        params, jnp.asarray(vol), apply_pp, 3, spec, acc_dtype="fp32"
    )
    scale = float(np.max(np.abs(np.asarray(ref))))
    assert float(np.max(np.abs(np.asarray(got) - np.asarray(ref)))) < 0.02 * scale


def test_zrow_tb_env_knob(rng, monkeypatch):
    """MEDSEG_ZROW_TB picks a bigger h_group divisor and must not change the
    blend (sweep knob, benchmarks/sweep_r3.sh)."""
    from medseg.ops.swi_zrow import _pick_h_group

    # config-4 geometry: nh=10 h-rows x n_w=3 w-windows (divisors of 10)
    assert _pick_h_group(10, 3) == 2  # default TB=8 -> batch 6
    monkeypatch.setenv("MEDSEG_ZROW_TB", "15")
    assert _pick_h_group(10, 3) == 5
    monkeypatch.setenv("MEDSEG_ZROW_TB", "30")
    assert _pick_h_group(10, 3) == 10

    vol = rng.normal(size=(20, 20, 14, 3)).astype(np.float32)
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, mode="gaussian")
    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec)
    monkeypatch.setenv("MEDSEG_ZROW_TB", "12")
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, 5, 8), 5, spec,
        acc_dtype="fp32",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h_group", [1, 2])
def test_zrow_h_group_matches(rng, h_group):
    """h-row grouping (bigger model batches) must not change the blend."""
    vol = rng.normal(size=(20, 20, 14, 3)).astype(np.float32)  # nh even
    w = rng.normal(size=(3, 5)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, mode="gaussian")
    ref = sliding_window_inference(jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, 5, spec)
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, 5, 8), 5, spec,
        acc_dtype="fp32", h_group=h_group,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape,overlap",
    [
        ((20, 18, 14, 3), 0.5),   # 4 d-starts over 8 devices (padded shards)
        ((40, 36, 32, 1), 0.25),  # uneven d-starts vs device count
        ((8, 8, 8, 2), 0.25),     # single window
    ],
)
def test_zrow_sharded_matches_single_device(rng, shape, overlap):
    """Mesh-sharded z-row walk == single-device z-row walk (d-slabs over the
    8-device virtual mesh, psum combine)."""
    from medseg.ops.swi_zrow import sliding_window_inference_zrow_sharded
    from medseg.parallel.mesh import make_mesh

    mesh = make_mesh()
    vol = rng.normal(size=shape).astype(np.float32)
    k = 5
    w = rng.normal(size=(shape[-1], k)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=overlap, mode="gaussian")
    ref = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, k, 8), k, spec,
        acc_dtype="fp32",
    )
    got = sliding_window_inference_zrow_sharded(
        jnp.asarray(w), jnp.asarray(vol), make_apply_pp(w, k, 8), k, spec, mesh,
        acc_dtype="fp32",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_zrow_sharded_validator_route(rng):
    """Validator with a mesh + the ppk serving layout routes through the
    sharded zrow walk and matches the plain single-device scan-SWI blend.

    On the CPU mesh the TPU fast path can't engage on its own, so this
    emulates the TPU serving configuration by installing a ppk-contract
    apply (same window form fast_apply_v3(pp=True) emits) on the validator.
    """
    from medseg.engine.evaluate import Validator
    from medseg.models.unetr import UNETR
    from medseg.parallel.mesh import make_mesh

    model = UNETR(
        in_channels=1, out_channels=3, img_size=(32, 32, 32), feature_size=4,
        hidden_size=24, mlp_dim=48, num_heads=4, num_layers=4, patch_size=16,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    vol = rng.normal(size=(40, 36, 32, 1)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(32, 32, 32), overlap=0.25, sw_batch=2)
    plain = Validator(model, 3, "ct", spec, use_fast_path=False)
    sharded = Validator(
        model, 3, "ct", spec, use_fast_path=False, mesh=make_mesh(),
        acc_dtype="fp32",
    )

    from medseg.ops.sliding_window import _flatk_pad

    k16 = _flatk_pad(3)

    def apply_pp(p, windows, wgt):
        lg = model.apply(p, windows, return_encoder_features=False) * wgt
        lg = jnp.pad(lg, [(0, 0)] * 4 + [(0, k16 - 3)])
        b, rd, rh, rw, _ = lg.shape
        g = lg.reshape(b, rd, rh // 2, 2, rw // 2, 2, k16)
        return g.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            b, rd, 4, rh // 2, (rw // 2) * k16
        )

    sharded._out_layout = "ppk"
    sharded._apply_fn = apply_pp
    sharded._apply_takes_weight = True
    ref = plain.infer_volume(params, jnp.asarray(vol))
    got = sharded.infer_volume(params, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_zrow_sharded_reuses_compiled_callable(rng):
    """Round-4 advisor: the sharded walk must not rebuild shard_map/jit
    closures per volume — repeat volumes at the same padded shape reuse the
    compiled executable. apply_fn only runs while TRACING, so the trace
    counter must not grow on the second call."""
    from medseg.ops.swi_zrow import sliding_window_inference_zrow_sharded
    from medseg.parallel.mesh import make_mesh

    mesh = make_mesh()
    k, k16 = 5, 8
    w = rng.normal(size=(2, k)).astype(np.float32)
    base = make_apply_pp(w, k, k16)
    traces = []

    def counting_apply(params, windows, wgt):
        traces.append(1)
        return base(params, windows, wgt)

    spec = SlidingWindowSpec(roi=(8, 8, 8), overlap=0.5, mode="gaussian")
    vols = [rng.normal(size=(12, 12, 12, 2)).astype(np.float32) for _ in range(2)]

    def run(v):
        return sliding_window_inference_zrow_sharded(
            jnp.asarray(w), jnp.asarray(v), counting_apply, k, spec, mesh,
            acc_dtype="fp32",
        )

    run(vols[0])
    n_first = len(traces)
    assert n_first > 0
    out2 = run(vols[1])
    assert len(traces) == n_first  # second identical-shape volume: no retrace
    # outputs still correct per-volume (not a cached result)
    ref = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vols[1]), base, k, spec, acc_dtype="fp32"
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-5, atol=1e-5)


# ---- z-packed ppk window form (round 5) ----


def make_apply_pp_zpack(k: int):
    """ppk window contract with optional z-packing AND in-kernel-W-fold
    emulation, via the same ``ndhwc_to_pp_windows`` fallback the flax path
    uses (so the tests pin the producer/consumer layout contracts end to
    end — declaring both kwargs makes the walk negotiate the packed,
    row-folded route whenever the grid admits it)."""
    from medseg.kernels.unetr_of import ndhwc_to_pp_windows
    from medseg.ops.sliding_window import _flatk_pad

    def apply_pp(params, windows, wgt, zpack=1, w_fold=None):
        lg = jnp.einsum("bdhwc,ck->bdhwk", windows, params) * wgt
        ppw = ndhwc_to_pp_windows(lg, zpack=zpack)
        if w_fold is None:
            return ppw
        n_w, w_starts2, wp_half = w_fold
        lk = zpack * _flatk_pad(k)
        g = ppw.shape[0] // n_w
        ppw = ppw.reshape((n_w, g) + ppw.shape[1:])
        rw2 = windows.shape[3] // 2
        row = jnp.zeros(ppw.shape[1:5] + (wp_half * lk,), ppw.dtype)
        for wi, ws2 in enumerate(w_starts2):
            row = row.at[..., ws2 * lk : (ws2 + rw2) * lk].add(ppw[wi])
        return row

    return apply_pp


def test_zrow_zpacked_matches_ndhwc(rng):
    """k16=16 -> zpack 8: the packed walk (z-packed windows, scaled W-fold
    plans, zp-unit D-folds, packed deinterleave) must blend identically to
    the reference NDHWC engine."""
    from medseg.ops.sliding_window import ppk_zpack
    from medseg.ops.swi_zrow import _grid_zpack

    k = 14
    vol = rng.normal(size=(32, 24, 24, 3)).astype(np.float32)
    w = rng.normal(size=(3, k)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(16, 16, 16), overlap=0.5, mode="gaussian")
    apply_pp = make_apply_pp_zpack(k)

    assert ppk_zpack(16, k) == 8
    # d-grid (starts 0, 8, 16) divides by 8 -> the packed route engages
    assert _grid_zpack(apply_pp, 16, k, [0, 8, 16], 32) == 8

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, k, spec
    )
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), apply_pp, k, spec, acc_dtype="fp32"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_zrow_zpack_grid_fallback(rng):
    """A d-grid that doesn't divide by the packing factor (overlap 0.25:
    starts 0, 12, 16) must fall back to unpacked windows — and still match."""
    from medseg.ops.swi_zrow import _grid_zpack

    k = 14
    vol = rng.normal(size=(32, 24, 24, 3)).astype(np.float32)
    w = rng.normal(size=(3, k)).astype(np.float32)
    spec = SlidingWindowSpec(roi=(16, 16, 16), overlap=0.25, mode="constant")
    apply_pp = make_apply_pp_zpack(k)
    assert _grid_zpack(apply_pp, 16, k, [0, 12, 16], 32) == 1

    ref = sliding_window_inference(
        jnp.asarray(w), jnp.asarray(vol), voxelwise_apply, k, spec
    )
    got = sliding_window_inference_zrow(
        jnp.asarray(w), jnp.asarray(vol), apply_pp, k, spec, acc_dtype="fp32"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
