"""Validation loops: sliding-window inference + metric accumulation.

Capability contract: ``validation`` (`/root/reference/unetr_segmentation_3d.py:103-132`)
and ``validation_all_metrics`` (`:134-209`) — per validation volume run
sliding-window inference, apply the post-transforms, accumulate Dice (and for
the full variant precision/sensitivity/Hausdorff), then aggregate mean and
per-class ("mean_batch") values and reset.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from medseg.ops.metrics import (
    ConfusionAccumulator,
    DiceAccumulator,
    HausdorffAccumulator,
)
from medseg.ops.post import argmax_onehot, sigmoid_threshold, to_onehot
from medseg.ops.sliding_window import SlidingWindowSpec, sliding_window_inference


@dataclasses.dataclass
class ValidationResult:
    mean_dice: float
    per_class_dice: np.ndarray
    mean_precision: float | None = None
    per_class_precision: np.ndarray | None = None
    mean_recall: float | None = None
    per_class_recall: np.ndarray | None = None
    mean_hausdorff: float | None = None
    per_class_hausdorff: np.ndarray | None = None


class Validator:
    """Sliding-window validator over a dataset of whole volumes.

    Args:
      model: UNETR flax module.
      n_classes: output channels.
      task: "ct" (argmax/one-hot post, seg :405-406) or "mri"
        (sigmoid+threshold post, seg :482).
      spec: sliding-window grid/blending config (seg :109 uses ROI=crop^3,
        sw_batch=4, overlap 0.25 constant).
      mesh: optional device mesh; when given, inference shards the window
        grid over the mesh ``data`` axis (context parallelism over volume
        space, SURVEY.md §5 long-context row) via
        ``sliding_window_inference_sharded``.
    """

    def __init__(
        self,
        model,
        n_classes: int,
        task: str,
        spec: SlidingWindowSpec,
        *,
        use_fast_path: bool | None = None,
        acc_dtype: str = "fp32",
        mesh=None,
    ) -> None:
        self.model = model
        self.n_classes = n_classes
        self.task = task
        self.spec = spec
        self.mesh = mesh
        self._out_layout = "ndhwc"
        self._apply_takes_weight = False
        # Validation metrics accumulate in fp32 by default (the MONAI-parity
        # contract); serving/bench opt into acc_dtype="bf16" explicitly
        # (measured ~0.4% relative blend error, ops/sliding_window.py).
        self._acc_dtype = acc_dtype

        if use_fast_path is None:
            # default ON where it helps: the v3 kernels only engage on TPU
            # for supported shapes (fast_path_supported_v2) and fall back to
            # the identical flax forward otherwise
            use_fast_path = jax.default_backend() == "tpu"

        if use_fast_path:
            from medseg.kernels.conv_of import _pp_ok
            from medseg.kernels.unetr_of import fast_apply_v3, fast_path_supported_v2

            # The fast scatter layouts require the v3 kernel path to engage
            # for the WINDOW shape (cubic roi >= 48, feature_size % 8 == 0,
            # <= 64); otherwise fast_apply_v3 falls back to the flax forward
            # whose output the pp/flat scatters could not consume — stay on
            # the plain NDHWC path then (round-2 advisor finding).
            window_shape = (spec.sw_batch, *spec.roi, model.in_channels)
            use_fast_path = fast_path_supported_v2(model, window_shape)

        if use_fast_path:
            # parity-plane scatter by default where the roi admits it:
            # with aligned plane-slice tap builds it measures 0.90 vs 0.82
            # vol/s for flatk (docs/PERF_NOTES.md ledger). Per-volume grids
            # that don't preserve parity fall back to flatk in infer_volume.
            self._pp_model = _pp_ok(spec.roi[1], spec.roi[2])
            self._out_layout = "ppk" if self._pp_model else "flatk"
            self._apply_takes_weight = True
            pp = self._pp_model
            # production serving default: tanh-approx ViT GELU on TPU (+4.5%
            # vol/s, trained-model Dice delta exactly 0.0 — promotion gate in
            # kernels/unetr_of.serving_gelu_approx); MEDSEG_FAST_GELU=0
            # restores the exact erf GELU
            from medseg.kernels.unetr_of import serving_gelu_approx

            gelu = serving_gelu_approx()

            def apply_fn(params, windows, wgt, zpack=1, w_fold=None):
                # fused output-form Pallas path on TPU: bf16 pre-weighted
                # logits (blend weight folded into the out-head kernel) into
                # the tile-aligned parity-plane/flat scatter; identical flax
                # forward elsewhere. ``zpack``/``w_fold`` are the z-packed,
                # in-kernel-W-folded window forms the zrow walk negotiates
                # (ops/sliding_window.ppk_zpack, swi_zrow._grid_zpack)
                return fast_apply_v3(
                    model, params, windows, flat_k16=True, out_scale=wgt,
                    pp=pp, gelu_approx=gelu, zpack=zpack, w_fold=w_fold,
                )

            def apply_fn_flat(params, windows, wgt):
                return fast_apply_v3(
                    model, params, windows, flat_k16=True, out_scale=wgt,
                    gelu_approx=gelu,
                )

            self._apply_fn_flat = apply_fn_flat

        else:

            def apply_fn(params, windows):
                return model.apply(params, windows, return_encoder_features=False)

        self._apply_fn = apply_fn

    def infer_volume(
        self, params, image: jax.Array, spec: SlidingWindowSpec | None = None
    ) -> jax.Array:
        """Blended whole-volume logits, (D, H, W, K) fp32."""
        spec = spec or self.spec
        if self.mesh is not None:
            from medseg.ops.sliding_window import sliding_window_inference_sharded
            from medseg.ops.swi_zrow import (
                sliding_window_inference_zrow_sharded,
                zrow_supported,
            )

            spatial = tuple(int(v) for v in image.shape[-4:-1])
            if self._out_layout == "ppk" and zrow_supported(spatial, spec):
                # mesh eval inherits the round-3 serving engine: d-slabs of
                # the z-row walk sharded over the data axis, psum combine
                return sliding_window_inference_zrow_sharded(
                    params, image, self._apply_fn, self.n_classes, spec,
                    self.mesh, acc_dtype=self._acc_dtype,
                )
            apply_fn = self._apply_fn
            out_layout = self._out_layout
            if self._apply_takes_weight:
                # the sharded scatter applies importance/normalization itself
                # (after the psum); feed a unit blend weight, and use the
                # flat window form (ppk is a single-device scatter layout)
                out_layout = "flatk" if out_layout == "ppk" else out_layout
                base = getattr(self, "_apply_fn_flat", self._apply_fn)

                def apply_fn(p, w, _f=base):
                    return _f(p, w, jnp.ones(w.shape[:4] + (1,), jnp.float32))

            return sliding_window_inference_sharded(
                params, image, apply_fn, self.n_classes, spec, self.mesh,
                out_layout=out_layout,
            )
        out_layout = self._out_layout
        apply_fn = self._apply_fn
        if out_layout == "ppk":
            from medseg.ops.swi_zrow import sliding_window_inference_zrow, zrow_supported

            spatial = tuple(int(v) for v in image.shape[-4:-1])
            if zrow_supported(spatial, spec):
                # z-row walk with deferred overlap-add: same ppk window
                # contract, no scatter (round-3 serving default)
                return sliding_window_inference_zrow(
                    params, image, apply_fn, self.n_classes, spec,
                    acc_dtype=self._acc_dtype,
                )
            # zrow_supported IS the ppk-geometry predicate (one routing
            # function by design), so there is no ppk-scatter fallback:
            # unsupported grids drop to the flat window form.
            out_layout = "flatk"
            apply_fn = self._apply_fn_flat
        return sliding_window_inference(
            params, image, apply_fn, self.n_classes, spec,
            out_layout=out_layout,
            apply_takes_weight=self._apply_takes_weight,
            acc_dtype=self._acc_dtype,
        )

    def predict_mask(
        self, params, image: jax.Array, spec: SlidingWindowSpec | None = None
    ) -> jax.Array:
        logits = self.infer_volume(params, image, spec)
        if self.task == "ct":
            return argmax_onehot(logits, self.n_classes)
        return sigmoid_threshold(logits)

    def _post_label(self, label: jax.Array) -> jax.Array:
        if self.task == "ct":
            return to_onehot(label, self.n_classes)
        return label.astype(jnp.float32)  # BraTS labels already multi-channel

    def __call__(
        self, params, volumes: Iterable[dict], *, all_metrics: bool = False
    ) -> ValidationResult:
        dice = DiceAccumulator()
        prec = ConfusionAccumulator("precision") if all_metrics else None
        rec = ConfusionAccumulator("sensitivity") if all_metrics else None
        hsd = HausdorffAccumulator() if all_metrics else None
        for batch in volumes:
            image, label = batch["image"], batch["label"]
            pred = self.predict_mask(params, image)[None]
            lab = self._post_label(jnp.asarray(label))
            if lab.ndim == 4:
                lab = lab[None]
            dice(pred, lab)
            if all_metrics:
                prec(pred, lab)
                rec(pred, lab)
                hsd(pred, lab)
        result = ValidationResult(
            mean_dice=float(dice.aggregate("mean")),
            per_class_dice=dice.aggregate("mean_batch"),
        )
        if all_metrics:
            result.mean_precision = float(prec.aggregate("mean"))
            result.per_class_precision = prec.aggregate("mean_batch")
            result.mean_recall = float(rec.aggregate("mean"))
            result.per_class_recall = rec.aggregate("mean_batch")
            result.mean_hausdorff = float(hsd.aggregate("mean"))
            result.per_class_hausdorff = hsd.aggregate("mean_batch")
        return result
