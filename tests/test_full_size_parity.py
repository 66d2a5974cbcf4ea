"""Full-size trained-model parity vs the torch oracle (VERDICT r2 item 6).

UNETR-B/16 at 96^3 / 14 classes — the exact flagship configuration
(`/root/reference/unetr_segmentation_3d.py:501-513`) — with *trained-ish*
weights (a few torch Adam steps on a CE loss, so norm statistics and
activations are off the init distribution), run through sliding-window
inference on a 160^3 volume on BOTH sides:

- torch: a faithful MONAI-0.6-contract SWI loop around the contract-built
  TorchUNETR (tests/test_model_parity_torch.py);
- jax: ``sliding_window_inference`` with converted weights, fp32.

Asserts blended-logit tolerance AND >= 99.9% argmax agreement for the fp32
path, then records the bf16 zrow serving-path delta (PARITY.md documents the
numbers). Slow CPU test: ``pytest -m slow tests/test_full_size_parity.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import tests.test_model_parity_torch as tp
from medseg.engine.checkpoint import convert_torch_state_dict, merge_params
from medseg.models.unetr import UNETR
from medseg.ops.sliding_window import SlidingWindowSpec, sliding_window_inference

FULL = dict(HID=768, MLP=3072, HEADS=12, LAYERS=12, FS=16, PATCH=16,
            CROP=96, IN_CH=1, OUT_CH=14)
VOL = (160, 160, 160)
OVERLAP = 0.25


def torch_swi(model, vol_ncdhw: torch.Tensor, roi: int, overlap: float,
              sw_batch: int = 4) -> np.ndarray:
    """MONAI 0.6 ``sliding_window_inference`` contract: dense start grid with
    clipped last starts, constant importance, accumulate + count-normalize."""
    from medseg.ops.sliding_window import compute_window_starts

    _, _, D, H, W = vol_ncdhw.shape
    starts = compute_window_starts((D, H, W), (roi,) * 3, overlap)
    out = None
    count = torch.zeros((1, 1, D, H, W), dtype=torch.float64)
    with torch.no_grad():
        for i in range(0, len(starts), sw_batch):
            chunk = starts[i : i + sw_batch]
            windows = torch.cat(
                [
                    vol_ncdhw[:, :, s[0]:s[0]+roi, s[1]:s[1]+roi, s[2]:s[2]+roi]
                    for s in chunk
                ]
            )
            logits = model(windows)
            if out is None:
                out = torch.zeros(
                    (1, logits.shape[1], D, H, W), dtype=torch.float64
                )
            for j, s in enumerate(chunk):
                out[:, :, s[0]:s[0]+roi, s[1]:s[1]+roi, s[2]:s[2]+roi] += (
                    logits[j : j + 1].double()
                )
                count[:, :, s[0]:s[0]+roi, s[1]:s[1]+roi, s[2]:s[2]+roi] += 1.0
    return (out / count).float().numpy()


@pytest.mark.slow
def test_full_size_trained_swi_parity(rng):
    saved = {k: getattr(tp, k) for k in FULL}
    for k, v in FULL.items():
        setattr(tp, k, v)
    try:
        torch.manual_seed(0)
        tmodel = tp.TorchUNETR()
        # "trained-ish": 2 Adam steps of CE on random labels moves every
        # norm affine / weight off the init distribution
        opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
        for _ in range(2):
            x = torch.randn(1, 1, 96, 96, 96)
            y = torch.randint(0, 14, (1, 96, 96, 96))
            loss = torch.nn.functional.cross_entropy(tmodel(x), y)
            opt.zero_grad(); loss.backward(); opt.step()
        tmodel.eval()

        vol = rng.normal(size=(1, 1) + VOL).astype(np.float32) * 0.3 + 0.2
        ref = torch_swi(tmodel, torch.tensor(vol), 96, OVERLAP)  # (1,14,D,H,W)

        jmodel = UNETR(
            in_channels=1, out_channels=14, img_size=(96,) * 3,
            feature_size=16, hidden_size=768, mlp_dim=3072, num_heads=12,
            num_layers=12, patch_size=16,
        )
        xj = jnp.asarray(vol[0, 0][..., None])  # (D, H, W, 1)
        template = jax.eval_shape(
            lambda: jmodel.init(jax.random.key(0), jnp.zeros((1, 96, 96, 96, 1)))
        )
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template
        )
        params = merge_params(template, convert_torch_state_dict(tmodel.state_dict()))
        params = jax.tree_util.tree_map(jnp.asarray, params)

        spec = SlidingWindowSpec(roi=(96,) * 3, overlap=OVERLAP, sw_batch=4)

        def apply_plain(p, windows):
            return jmodel.apply(p, windows, return_encoder_features=False)

        got = sliding_window_inference(params, xj, apply_plain, 14, spec)
        got_ncdhw = np.asarray(got).transpose(3, 0, 1, 2)[None]

        # fp32 path: blended-logit tolerance + argmax agreement >= 99.9%
        scale = np.abs(ref).max()
        assert np.abs(got_ncdhw - ref).max() < 2e-3 * scale
        agree = (got_ncdhw.argmax(1) == ref.argmax(1)).mean()
        assert agree >= 0.999, f"fp32 argmax agreement {agree:.5f}"

        # serving path delta (zrow walk, ppk window form, bf16 accumulate)
        from medseg.kernels.unetr_of import fast_apply_v3
        from medseg.ops.swi_zrow import sliding_window_inference_zrow

        def apply_pp(p, windows, wgt):
            return fast_apply_v3(
                jmodel, p, windows, flat_k16=True, out_scale=wgt, pp=True
            )

        served = sliding_window_inference_zrow(
            params, xj, apply_pp, 14, spec, acc_dtype="bf16"
        )
        served_agree = (
            np.asarray(served).argmax(-1) == got_ncdhw[0].argmax(0)
        ).mean()
        print(f"fp32 agreement {agree:.5f}; zrow-bf16 vs fp32 {served_agree:.5f}")
        assert served_agree >= 0.995, f"serving argmax agreement {served_agree:.5f}"
    finally:
        for k, v in saved.items():
            setattr(tp, k, v)


BRATS = dict(HID=768, MLP=3072, HEADS=12, LAYERS=12, FS=16, PATCH=16,
             CROP=128, IN_CH=4, OUT_CH=4)
BRATS_VOL = (144, 144, 144)


@pytest.mark.slow
def test_full_size_brats_swi_parity(rng):
    """BraTS flagship shape (`unetr_segmentation_3d.py:309-318,407-482`):
    4-modality input, 128^3 windows, sigmoid masks. The multi-channel gate
    routes serving to the exact flax forward, so this pins the configuration
    end-to-end: torch-oracle SWI vs jax SWI blended logits AND the sigmoid
    mask the MRI branch thresholds."""
    saved = {k: getattr(tp, k) for k in BRATS}
    for k, v in BRATS.items():
        setattr(tp, k, v)
    try:
        torch.manual_seed(0)
        tmodel = tp.TorchUNETR()
        opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
        for _ in range(2):
            x = torch.randn(1, 4, 128, 128, 128)
            y = (torch.rand(1, 4, 128, 128, 128) > 0.7).float()
            loss = torch.nn.functional.binary_cross_entropy_with_logits(
                tmodel(x), y
            )
            opt.zero_grad(); loss.backward(); opt.step()
        tmodel.eval()

        vol = rng.normal(size=(1, 4) + BRATS_VOL).astype(np.float32) * 0.3
        ref = torch_swi(tmodel, torch.tensor(vol), 128, OVERLAP)  # (1,4,D,H,W)

        jmodel = UNETR(
            in_channels=4, out_channels=4, img_size=(128,) * 3,
            feature_size=16, hidden_size=768, mlp_dim=3072, num_heads=12,
            num_layers=12, patch_size=16,
        )
        xj = jnp.asarray(vol[0].transpose(1, 2, 3, 0))  # (D, H, W, 4)
        template = jax.eval_shape(
            lambda: jmodel.init(jax.random.key(0), jnp.zeros((1, 128, 128, 128, 4)))
        )
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template
        )
        params = merge_params(template, convert_torch_state_dict(tmodel.state_dict()))
        params = jax.tree_util.tree_map(jnp.asarray, params)

        spec = SlidingWindowSpec(roi=(128,) * 3, overlap=OVERLAP, sw_batch=4)

        def apply_plain(p, windows):
            return jmodel.apply(p, windows, return_encoder_features=False)

        got = sliding_window_inference(params, xj, apply_plain, 4, spec)
        got_ncdhw = np.asarray(got).transpose(3, 0, 1, 2)[None]

        scale = np.abs(ref).max()
        assert np.abs(got_ncdhw - ref).max() < 2e-3 * scale
        # the MRI branch thresholds sigmoid(logits) > 0.5 (seg :482)
        mask_ref = ref > 0.0
        mask_got = got_ncdhw > 0.0
        agree = (mask_ref == mask_got).mean()
        assert agree >= 0.999, f"sigmoid mask agreement {agree:.5f}"
    finally:
        for k, v in saved.items():
            setattr(tp, k, v)
