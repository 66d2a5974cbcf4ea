"""Evaluation metrics with the MONAI accumulate/aggregate/reset protocol.

Contracts (call sites `/root/reference/unetr_segmentation_3d.py:484-496` and
use at `:118-128,156-192`):

- ``DiceMetric(include_background=True)``: per-(sample, class) binary dice
  ``2|X∩Y| / (|X|+|Y|)``; NaN when both prediction and label are empty.
  ``aggregate()`` with reduction "mean" = nanmean over samples AND classes;
  "mean_batch" = nanmean over samples per class.
- ``ConfusionMatrixMetric(metric_name="precision"|"sensitivity")``: tp/fp/tn/fn
  per (sample, class); precision = tp/(tp+fp), sensitivity = tp/(tp+fn),
  NaN on 0/0; same reductions.
- ``HausdorffDistanceMetric``: max symmetric surface distance (HD100) between
  the edge voxels of binarized pred/label. Euclidean distance transform runs
  on host (scipy) — eval-only, off the training hot path (SURVEY.md §5's
  "Hausdorff on TPU" note).

Device work (intersection/count reductions) is jnp and jit-friendly; the
per-class counts are also what the data-parallel eval path ``psum``s across
the mesh (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dice_scores",
    "confusion_counts",
    "DiceAccumulator",
    "ConfusionAccumulator",
    "HausdorffAccumulator",
    "hausdorff_distance",
]


def dice_scores(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary dice per (sample, class) from channels-last one-hot masks.

    Returns (B, C) float32 with NaN where both masks are empty.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    spatial = tuple(range(1, pred.ndim - 1))
    inter = jnp.sum(pred * target, axis=spatial)
    denom = jnp.sum(pred, axis=spatial) + jnp.sum(target, axis=spatial)
    return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1.0), jnp.nan)


def confusion_counts(pred: jax.Array, target: jax.Array) -> jax.Array:
    """(B, C, 4) [tp, fp, tn, fn] counts from channels-last binary masks."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    spatial = tuple(range(1, pred.ndim - 1))
    tp = jnp.sum(pred * target, axis=spatial)
    fp = jnp.sum(pred * (1.0 - target), axis=spatial)
    fn = jnp.sum((1.0 - pred) * target, axis=spatial)
    tn = jnp.sum((1.0 - pred) * (1.0 - target), axis=spatial)
    return jnp.stack([tp, fp, tn, fn], axis=-1)


def _nan_reduce(values: np.ndarray, reduction: str) -> np.ndarray:
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices -> NaN
        if reduction == "mean":
            return np.float32(np.nanmean(values))
        if reduction == "mean_batch":
            return np.nanmean(values, axis=0).astype(np.float32)
    raise ValueError(f"unknown reduction {reduction!r}")


class _Accumulator:
    """MONAI metric protocol: ``__call__`` accumulates, ``aggregate`` reduces,
    ``reset`` clears (`unetr_segmentation_3d.py:118-129`)."""

    def __init__(self) -> None:
        self._buffer: list[np.ndarray] = []

    def reset(self) -> None:
        self._buffer.clear()

    def _stacked(self) -> np.ndarray:
        if not self._buffer:
            raise RuntimeError("aggregate() called before any accumulation")
        return np.concatenate(self._buffer, axis=0)


class DiceAccumulator(_Accumulator):
    def __call__(self, y_pred, y) -> None:
        self._buffer.append(np.asarray(dice_scores(y_pred, y)))

    def aggregate(self, reduction: str = "mean") -> np.ndarray:
        return _nan_reduce(self._stacked(), reduction)


class ConfusionAccumulator(_Accumulator):
    """Accumulates (B, C, 4) counts; metric computed at aggregate time."""

    def __init__(self, metric_name: str = "precision") -> None:
        super().__init__()
        if metric_name not in ("precision", "sensitivity"):
            raise ValueError(f"unsupported metric {metric_name!r}")
        self.metric_name = metric_name

    def __call__(self, y_pred, y) -> None:
        self._buffer.append(np.asarray(confusion_counts(y_pred, y)))

    def aggregate(self, reduction: str = "mean") -> np.ndarray:
        counts = self._stacked()  # (N, C, 4)
        tp, fp, _, fn = counts[..., 0], counts[..., 1], counts[..., 2], counts[..., 3]
        denom = tp + (fp if self.metric_name == "precision" else fn)
        with np.errstate(invalid="ignore", divide="ignore"):
            metric = np.where(denom > 0, tp / denom, np.nan)
        return _nan_reduce(metric, reduction)


def _mask_edges(mask: np.ndarray) -> np.ndarray:
    """Edge voxels: mask minus its erosion (6-connectivity), numpy only."""
    m = mask.astype(bool)
    if not m.any():
        return m
    eroded = m.copy()
    for axis in range(m.ndim):
        lo = np.roll(m, 1, axis=axis)
        hi = np.roll(m, -1, axis=axis)
        # voxels at the array border are edges (roll wraps; force border False)
        sl_lo = [slice(None)] * m.ndim
        sl_lo[axis] = slice(0, 1)
        lo[tuple(sl_lo)] = False
        sl_hi = [slice(None)] * m.ndim
        sl_hi[axis] = slice(-1, None)
        hi[tuple(sl_hi)] = False
        eroded &= lo & hi
    return m & ~eroded


def hausdorff_distance(
    pred: np.ndarray, target: np.ndarray, percentile: float | None = None
) -> float:
    """Symmetric (max of directed) surface distance between binary masks.

    HD100 when ``percentile`` is None — MONAI ``HausdorffDistanceMetric``
    defaults (`unetr_segmentation_3d.py:495-496`). NaN if either mask empty.
    """
    from scipy import ndimage  # host-side only

    pe = _mask_edges(np.asarray(pred))
    te = _mask_edges(np.asarray(target))
    if not pe.any() or not te.any():
        return float("nan")
    # Distance from every voxel to the nearest target-edge / pred-edge voxel.
    dt_t = ndimage.distance_transform_edt(~te)
    dt_p = ndimage.distance_transform_edt(~pe)
    d_pt = dt_t[pe]  # distances pred-edge -> target surface
    d_tp = dt_p[te]  # distances target-edge -> pred surface
    if percentile is None:
        return float(max(d_pt.max(), d_tp.max()))
    return float(
        max(np.percentile(d_pt, percentile), np.percentile(d_tp, percentile))
    )


class HausdorffAccumulator(_Accumulator):
    def __init__(self, percentile: float | None = None) -> None:
        super().__init__()
        self.percentile = percentile

    def __call__(self, y_pred, y) -> None:
        """y_pred/y: (B, D, H, W, C) binary, channels-last (host transfer here)."""
        yp = np.asarray(y_pred)
        yt = np.asarray(y)
        b, c = yp.shape[0], yp.shape[-1]
        out = np.empty((b, c), dtype=np.float32)
        for i in range(b):
            for j in range(c):
                out[i, j] = hausdorff_distance(
                    yp[i, ..., j], yt[i, ..., j], self.percentile
                )
        self._buffer.append(out)

    def aggregate(self, reduction: str = "mean") -> np.ndarray:
        return _nan_reduce(self._stacked(), reduction)
