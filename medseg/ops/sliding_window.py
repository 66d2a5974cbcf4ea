"""Sliding-window whole-volume inference as ONE compiled XLA program.

Capability contract: MONAI 0.6.0 ``sliding_window_inference`` as called by the
reference (`/root/reference/unetr_segmentation_3d.py:109,143` with
``overlap=0.25`` default, ``sw_batch_size=4``, constant blending; ``:694-695``
with ``overlap=0.8``); BASELINE.json config 4 additionally exercises
``overlap=0.5`` with gaussian blending.

Semantics reproduced:
- pad every spatial dim up to the ROI size, symmetrically (half before);
- scan interval per dim = ``int(roi * (1 - overlap))`` (= roi when the dim
  equals roi), window starts at ``k * interval`` clipped to ``dim - roi`` so
  the last window is flush with the border;
- each window is weighted by an importance map (constant ones, or a gaussian
  with ``sigma = sigma_scale * roi`` centered on the window), accumulated,
  and normalized by the accumulated importance;
- padding cropped off at the end.

TPU-native design (the reference's MONAI implementation is a Python loop that
launches one forward per window stack — the A100 baseline's weakness named in
SURVEY.md §7):

- window starts are STATIC per (volume shape, roi, overlap) — computed on
  host, padded to a multiple of ``sw_batch``, and baked into a ``lax.scan``;
- each scan step gathers ``sw_batch`` windows with vmapped
  ``lax.dynamic_slice``, runs them through the jitted model as one batch
  (MXU stays busy), and scatter-accumulates weighted logits with
  ``lax.dynamic_update_slice`` — sequentially within the step so overlapping
  windows never race;
- the normalization count-map depends only on the static grid, so it is
  precomputed once per grid on host and cached;
- accumulation is fp32 even when the model computes in bf16;
- optional shape bucketing (``bucket_multiple``) rounds padded dims up so a
  whole dataset of heterogeneous volumes reuses a handful of compiled graphs.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SlidingWindowSpec:
    roi: tuple[int, int, int]
    overlap: float = 0.25
    sw_batch: int = 4
    mode: str = "constant"  # "constant" | "gaussian"
    sigma_scale: float = 0.125
    bucket_multiple: int = 1  # round padded dims up to bound recompiles


def _scan_interval(image_size: Sequence[int], roi: Sequence[int], overlap: float):
    out = []
    for dim, r in zip(image_size, roi):
        if r == dim:
            out.append(r)
        else:
            out.append(max(1, int(r * (1.0 - overlap))))
    return tuple(out)


def per_dim_window_starts(
    image_size: Sequence[int], roi: Sequence[int], overlap: float
) -> list[np.ndarray]:
    """Per-dimension window starts, MONAI ``dense_patch_slices`` semantics:
    ``k * interval`` clipped to ``dim - roi``, duplicates removed."""
    intervals = _scan_interval(image_size, roi, overlap)
    per_dim = []
    for dim, r, step in zip(image_size, roi, intervals):
        n = int(math.ceil((dim - r) / step)) + 1
        starts = np.minimum(np.arange(n) * step, dim - r)
        per_dim.append(np.unique(starts).astype(np.int64))
    return per_dim


def compute_window_starts(
    image_size: Sequence[int], roi: Sequence[int], overlap: float
) -> np.ndarray:
    """Dense window-start grid (the product of ``per_dim_window_starts``).
    Returns (N, 3) int32."""
    per_dim = per_dim_window_starts(image_size, roi, overlap)
    grid = np.stack(
        np.meshgrid(*per_dim, indexing="ij"), axis=-1
    ).reshape(-1, len(per_dim))
    return grid.astype(np.int32)


def constant_importance(roi: Sequence[int]) -> np.ndarray:
    return np.ones(tuple(roi), dtype=np.float32)


def gaussian_importance(roi: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """Separable gaussian window weight, peak-normalized to 1, zeros clamped
    to the smallest positive value (MONAI ``compute_importance_map`` contract)."""
    maps = []
    for r in roi:
        sigma = sigma_scale * r
        center = (r - 1) / 2.0
        x = np.arange(r, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    w = np.maximum(w, np.min(w[w > 0]))
    return w.astype(np.float32)


def _pad_amounts(shape: Sequence[int], roi: Sequence[int], multiple: int):
    pads = []
    for dim, r in zip(shape, roi):
        target = max(dim, r)
        if multiple > 1:
            target = int(math.ceil(target / multiple) * multiple)
        extra = target - dim
        pads.append((extra // 2, extra - extra // 2))
    return pads


@lru_cache(maxsize=32)
def _count_map_cached(padded_shape, roi, overlap, mode, sigma_scale) -> np.ndarray:
    starts = compute_window_starts(padded_shape, roi, overlap)
    imp = (
        constant_importance(roi)
        if mode == "constant"
        else gaussian_importance(roi, sigma_scale)
    )
    count = np.zeros(padded_shape, dtype=np.float32)
    for s in starts:
        count[
            s[0] : s[0] + roi[0], s[1] : s[1] + roi[1], s[2] : s[2] + roi[2]
        ] += imp
    return count


@lru_cache(maxsize=32)
def _device_grid_cached(padded_shape, roi, overlap, mode, sigma_scale, sw_batch):
    """Device-resident grid constants, uploaded ONCE per (shape, spec).

    Host->device transfers are expensive (on pod-remote setups they cross a
    network tunnel); the per-volume-shape grid (starts, validity mask,
    importance map, reciprocal count map) never changes, so cache it on
    device instead of re-uploading ~hundreds of MB per inference call.
    """
    starts_np = compute_window_starts(padded_shape, roi, overlap)
    n = starts_np.shape[0]
    n_pad = (-n) % sw_batch
    if n_pad:
        starts_np = np.concatenate(
            [starts_np, np.zeros((n_pad, 3), dtype=np.int32)], axis=0
        )
    valid_np = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    n_batches = starts_np.shape[0] // sw_batch
    imp_np = (
        constant_importance(roi)
        if mode == "constant"
        else gaussian_importance(roi, sigma_scale)
    )
    inv_count = 1.0 / _count_map_cached(padded_shape, roi, overlap, mode, sigma_scale)
    return (
        jnp.asarray(starts_np.reshape(n_batches, sw_batch, 3)),
        jnp.asarray(valid_np.reshape(n_batches, sw_batch)),
        jnp.asarray(imp_np),
        jnp.asarray(inv_count),
    )


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "roi", "n_classes", "sw_batch", "pads", "out_shape",
        "out_layout", "apply_takes_weight", "acc_dtype",
    ),
)
def _swi_device(
    params,
    volume: jax.Array,  # (D, H, W, C) unpadded
    starts: jax.Array,  # (n_batches, sw_batch, 3) int32
    valid: jax.Array,  # (n_batches, sw_batch) float32
    importance: jax.Array,  # (rd, rh, rw) float32
    inv_count: jax.Array,  # padded-shape reciprocal normalization map
    *,
    apply_fn: Callable,
    roi: tuple[int, int, int],
    n_classes: int,
    sw_batch: int,
    pads: tuple[tuple[int, int], ...],
    out_shape: tuple[int, int, int],
    out_layout: str = "ndhwc",
    apply_takes_weight: bool = False,
    acc_dtype: str = "fp32",
) -> jax.Array:
    rd, rh, rw = roi
    if any(lo or hi for lo, hi in pads):
        volume = jnp.pad(volume, list(pads) + [(0, 0)])
    c = volume.shape[-1]
    if out_layout in ("flatk", "ppk"):
        return _swi_device_flatk(
            params, volume, starts, valid, importance, inv_count,
            apply_fn=apply_fn, roi=roi, n_classes=n_classes,
            sw_batch=sw_batch, pads=pads, out_shape=out_shape,
            apply_takes_weight=apply_takes_weight,
            acc_dtype=jnp.bfloat16 if acc_dtype == "bf16" else jnp.float32,
            pp=out_layout == "ppk",
        )
    channels_first = out_layout == "ndchw"
    if channels_first:
        # (D, K, H, W) accumulator: the Pallas fast path emits output-form
        # logits whose channel-first reshape is free (no transpose per
        # window); one transpose per VOLUME at the end restores NDHWC.
        acc = jnp.zeros(
            (volume.shape[0], n_classes) + volume.shape[1:3], dtype=jnp.float32
        )
        imp = importance[:, None]  # (rd, 1, rh, rw)
    else:
        acc = jnp.zeros(volume.shape[:3] + (n_classes,), dtype=jnp.float32)
        imp = importance[..., None]  # (rd, rh, rw, 1)

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0), (rd, rh, rw, c)
        )

    def gather_inv(start):
        # fold the 1/count normalization into the scatter: saves a separate
        # full-volume fp32 pass (and its 2.3GB temporary at 512^3-scale)
        return jax.lax.dynamic_slice(inv_count, (start[0], start[1], start[2]), (rd, rh, rw))

    def step(acc, batch):
        starts_b, valid_b = batch  # (sw_batch, 3), (sw_batch,)
        windows = jax.vmap(gather)(starts_b)  # (sw_batch, rd, rh, rw, C)
        inv_w = jax.vmap(gather_inv)(starts_b)  # (sw_batch, rd, rh, rw)
        logits = apply_fn(params, windows).astype(jnp.float32)
        if channels_first:
            # logits (sw_batch, rd, K, rh, rw)
            weighted = (
                logits
                * (imp[None] * inv_w[:, :, None])
                * valid_b[:, None, None, None, None]
            )
        else:
            weighted = (
                logits
                * (imp[None] * inv_w[..., None])
                * valid_b[:, None, None, None, None]
            )

        def scatter(i, a):
            s = starts_b[i]
            if channels_first:
                idx = (s[0], 0, s[1], s[2])
                blk = (rd, n_classes, rh, rw)
            else:
                idx = (s[0], s[1], s[2], 0)
                blk = (rd, rh, rw, n_classes)
            cur = jax.lax.dynamic_slice(a, idx, blk)
            return jax.lax.dynamic_update_slice(a, cur + weighted[i], idx)

        acc = jax.lax.fori_loop(0, sw_batch, scatter, acc)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (starts, valid))
    # crop the padding off inside the same program
    if channels_first:
        begin = (pads[0][0], 0, pads[1][0], pads[2][0])
        blk = (out_shape[0], n_classes, out_shape[1], out_shape[2])
        return jax.lax.dynamic_slice(acc, begin, blk).transpose(0, 2, 3, 1)
    begin = tuple(lo for lo, _ in pads) + (0,)
    return jax.lax.dynamic_slice(acc, begin, out_shape + (n_classes,))


def _flatk_pad(k: int) -> int:
    """Classes padded to a multiple of 8 for the flat (D, H, W*K16) layout."""
    return max(8, -(-k // 8) * 8)


def ppk_zpack(rd: int, n_classes: int) -> int:
    """Z-packing factor of the z-packed ppk window form (round 5).

    ``zpack = 128 // K16`` consecutive z-rows share a lane tile —
    (B, rd/zpack, 4, rh/2, (rw/2)*zpack*K16), K-minor within each packed
    z-row — so the transposed out-head kernel stores full 128-lane tiles
    (the unpacked K-minor store ran at ~1/8 DMA efficiency,
    benchmarks/probe_outhead_t.py) and the ppk exit transpose disappears.
    Used by ``fast_apply_v3`` (producer) and the zrow walk (consumer);
    both sides must call THIS function so they can never disagree.
    Returns 1 (unpacked) when the shape doesn't divide or MEDSEG_ZPACK=0.
    """
    import os

    if os.environ.get("MEDSEG_ZPACK", "1") == "0":
        return 1
    k16 = _flatk_pad(n_classes)
    if 128 % k16 or rd % (128 // k16):
        return 1
    return 128 // k16


def _swi_device_flatk(
    params,
    volume: jax.Array,  # (D, H, W, C) already padded
    starts: jax.Array,
    valid: jax.Array,
    importance: jax.Array,
    inv_count: jax.Array,
    *,
    apply_fn: Callable,
    roi: tuple[int, int, int],
    n_classes: int,
    sw_batch: int,
    pads: tuple[tuple[int, int], ...],
    out_shape: tuple[int, int, int],
    apply_takes_weight: bool = False,
    acc_dtype=jnp.float32,
    pp: bool = False,
) -> jax.Array:
    """Tile-aligned scatter: accumulator (D, H, W*K16), classes padded to K16.

    Why: window starts are multiples of ``interval`` (48 for the headline
    96^3/0.5 grid), which is NOT a multiple of the 128-lane tile — every
    ``dynamic_update_slice`` into an NDHWC or NDCHW accumulator rewrites
    partially-covered tiles. Packing (W, K16) into one flat minor dim makes
    the lane offset ``start_w * K16`` a tile multiple whenever
    ``interval * K16 % 128 == 0`` (e.g. 48*16=768), and the sublane offset
    ``start_h`` 8-aligned. Measured 0.73 -> 0.43 s/vol glue-only at
    BASELINE config 4 (benchmarks, round 2).

    ``apply_fn`` may return (B, rd, rh, rw, K) or pre-padded (..., K16) —
    extra channels are blended too but cropped before return, so their
    values are irrelevant. bf16 logits are accepted (halves scatter-side
    read traffic); accumulation stays fp32.
    """
    rd, rh, rw = roi
    c = volume.shape[-1]
    k16 = _flatk_pad(n_classes)
    d, h, w = volume.shape[:3]
    # acc_dtype=bf16 halves the scatter read-modify-write traffic (the
    # largest remaining SWI cost); blend contributions are same-sign and
    # <= 8 per voxel, so the bf16 accumulation error (~0.4% relative) is at
    # the same scale as the bf16 model-logit noise. MONAI-contract fp32 is
    # the default; the serving path opts into bf16.
    #
    # pp=True ("ppk"): the model emits PARITY-PLANE windows
    # (rd, 4, rh/2, (rw/2)*K16) (see kernels/conv_of.py:_pp_ok) and the
    # accumulator lives in the same plane order, (D, 4, H/2, (W/2)*K16);
    # window starts are even (interval multiples), so parity is preserved
    # and every scatter offset stays tile-aligned. ONE deinterleave runs
    # per volume at the end, instead of per-window lane relayouts.
    if pp:
        acc = jnp.zeros((d, 4, h // 2, (w // 2) * k16), acc_dtype)
    else:
        acc = jnp.zeros((d, h, w * k16), acc_dtype)
    imp = importance[..., None]  # (rd, rh, rw, 1)

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0), (rd, rh, rw, c)
        )

    def gather_inv(start):
        return jax.lax.dynamic_slice(inv_count, (start[0], start[1], start[2]), (rd, rh, rw))

    def step(acc, batch):
        starts_b, valid_b = batch
        # NOTE: vmapped gathers measured FASTER than a static unroll
        # (0.815 vs 0.809 vol/s), same as the scatter loop — the XLA while
        # machinery schedules these dynamic slices better than unrolled DUS
        windows = jax.vmap(gather)(starts_b)
        inv_w = jax.vmap(gather_inv)(starts_b)
        wgt = (imp[None] * inv_w[..., None]) * valid_b[:, None, None, None, None]
        if pp:
            # (SW, rd, 4, rh/2, (rw/2)*K16) straight from the PP fast path
            flat = apply_fn(params, windows, wgt)
        elif apply_takes_weight:
            # the model multiplies the blend weight in its out-head epilogue
            # (Pallas fast path) — no standalone full-volume multiply pass
            weighted = apply_fn(params, windows, wgt)
            if weighted.shape[-1] != k16:
                weighted = jnp.pad(
                    weighted, [(0, 0)] * 4 + [(0, k16 - weighted.shape[-1])]
                )
            flat = weighted.reshape(sw_batch, rd, rh, rw * k16)
        else:
            logits = apply_fn(params, windows)  # (SW, rd, rh, rw, K or K16)
            if logits.shape[-1] != k16:
                logits = jnp.pad(logits, [(0, 0)] * 4 + [(0, k16 - logits.shape[-1])])
            weighted = (logits.astype(jnp.float32) * wgt).astype(logits.dtype)
            flat = weighted.reshape(sw_batch, rd, rh, rw * k16)

        def scatter(i, a):
            s = starts_b[i]
            if pp:
                idx = (s[0], 0, s[1] // 2, (s[2] // 2) * k16)
                blk = (rd, 4, rh // 2, (rw // 2) * k16)
            else:
                idx = (s[0], s[1], s[2] * k16)
                blk = (rd, rh, rw * k16)
            cur = jax.lax.dynamic_slice(a, idx, blk)
            return jax.lax.dynamic_update_slice(a, cur + flat[i].astype(a.dtype), idx)

        # NOTE: measured AGAINST a static unroll: the fori_loop version runs
        # 0.542 vol/s vs 0.495 unrolled at BASELINE config 4 (the unrolled
        # 8-DUS chain schedules worse); keep the loop.
        return jax.lax.fori_loop(0, sw_batch, scatter, acc), None

    acc, _ = jax.lax.scan(step, acc, (starts, valid))
    if pp:
        # ONE parity-plane deinterleave for the whole volume
        acc = acc.reshape(d, 2, 2, h // 2, w // 2, k16)
        acc = acc.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w, k16)
    else:
        acc = acc.reshape(d, h, w, k16)
    begin = tuple(lo for lo, _ in pads) + (0,)
    return jax.lax.dynamic_slice(acc, begin, out_shape + (n_classes,)).astype(jnp.float32)


def ppk_supported(spatial, spec: SlidingWindowSpec) -> bool:
    """The parity-plane scatter ("ppk") needs parity-preserving geometry:
    even roi, even pads, and every window start even (interval multiples and
    the clipped last starts). Checked host-side from the static grid."""
    roi = tuple(spec.roi)
    if any(r % 2 for r in roi):
        return False
    pads = _pad_amounts(spatial, roi, spec.bucket_multiple)
    if any(lo % 2 or (lo + hi + s) % 2 for (lo, hi), s in zip(pads, spatial)):
        return False
    padded = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pads))
    starts = compute_window_starts(padded, roi, spec.overlap)
    return bool((starts % 2 == 0).all())


def sliding_window_inference(
    params,
    volume,
    apply_fn: Callable,
    n_classes: int,
    spec: SlidingWindowSpec,
    out_layout: str = "ndhwc",
    apply_takes_weight: bool = False,
    acc_dtype: str = "fp32",
) -> jax.Array:
    """Run whole-volume inference.

    Args:
      params: model parameter pytree (closed over by ``apply_fn``).
      volume: (D, H, W, C) or (1, D, H, W, C) array (host or device).
      apply_fn: ``apply_fn(params, windows) -> logits`` mapping a
        (sw_batch, rd, rh, rw, C) window stack to (sw_batch, rd, rh, rw, K) —
        or to (sw_batch, rd, K, rh, rw) with ``out_layout="ndchw"`` (the
        Pallas fast path emits channel-first logits transpose-free; the
        accumulator then also lives channel-first and only the final volume
        is transposed back). With ``out_layout="flatk"`` the accumulator is
        the tile-aligned flat (D, H, W*K16) layout (see ``_swi_device_flatk``)
        and ``apply_fn`` may return NDHWC logits with K or pre-padded K16
        channels, fp32 or bf16.
      n_classes: K.
      spec: grid/blending configuration.
      out_layout: layout of ``apply_fn``'s logits — one of
        "ndhwc" (B, rd, rh, rw, K), "ndchw" (B, rd, K, rh, rw),
        "flatk" (NDHWC with K or K16 channels into the tile-aligned flat
        (D, H, W*K16) accumulator), or "ppk" (parity-plane windows
        (B, rd, 4, rh/2, (rw/2)*K16) into the plane-ordered accumulator;
        requires ``ppk_supported``).
      apply_takes_weight: with "flatk"/"ppk", ``apply_fn(params, windows,
        wgt)`` receives the per-voxel blend weight (importance * 1/count *
        validity, shape (B, rd, rh, rw, 1)) and must fold it into its
        logits (the Pallas out-head multiplies it in its epilogue).
      acc_dtype: "fp32" (default, MONAI-parity accumulation) or "bf16"
        (serving opt-in; halves scatter RMW traffic at ~0.4% relative
        blend error — flatk/ppk only).

    Returns:
      (D, H, W, K) float32 blended logits at the ORIGINAL (unpadded) size.
    """
    if out_layout not in ("ndhwc", "ndchw", "flatk", "ppk"):
        raise ValueError(f"unknown out_layout: {out_layout!r}")
    squeeze = False
    if volume.ndim == 5:
        if volume.shape[0] != 1:
            raise ValueError("sliding_window_inference expects a single volume")
        volume = volume[0]
        squeeze = True
    spatial = tuple(int(s) for s in volume.shape[:3])
    roi = tuple(spec.roi)
    pads = tuple(_pad_amounts(spatial, roi, spec.bucket_multiple))
    padded_shape = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pads))

    if out_layout == "ppk" and not ppk_supported(spatial, spec):
        raise ValueError(
            "ppk layout requires even roi/pads and even window starts; "
            "use out_layout='flatk' for this grid"
        )
    starts, valid, imp, inv_count = _device_grid_cached(
        padded_shape, roi, spec.overlap, spec.mode, spec.sigma_scale, spec.sw_batch
    )
    out = _swi_device(
        params,
        jnp.asarray(volume),
        starts,
        valid,
        imp,
        inv_count,
        apply_fn=apply_fn,
        roi=roi,
        n_classes=n_classes,
        sw_batch=spec.sw_batch,
        pads=pads,
        out_shape=spatial,
        out_layout=out_layout,
        apply_takes_weight=apply_takes_weight,
        acc_dtype=acc_dtype,
    )
    if squeeze:
        out = out[None]
    return out


# ---------------------------------------------------------------------------
# Sharded sliding-window inference: context parallelism over the window grid
# ---------------------------------------------------------------------------

def sliding_window_inference_sharded(
    params,
    volume,
    apply_fn: Callable,
    n_classes: int,
    spec: SlidingWindowSpec,
    mesh,
    out_layout: str = "ndhwc",
) -> jax.Array:
    """Whole-volume inference with the window grid sharded across the mesh.

    SURVEY.md §5 "long context" row: the reference's substitute for long-
    context scaling is sliding-window inference; beyond single-chip parity the
    TPU-native scale-out shards the window grid over the ``data`` mesh axis —
    each chip predicts its subset of windows into a local accumulator and one
    ``psum`` over ICI merges them. Embarrassingly parallel (no halo exchange:
    windows overlap only in the accumulator).

    Semantics identical to `sliding_window_inference`.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    squeeze = False
    if volume.ndim == 5:
        volume = volume[0]
        squeeze = True
    spatial = tuple(int(s) for s in volume.shape[:3])
    roi = tuple(spec.roi)
    pads = tuple(_pad_amounts(spatial, roi, spec.bucket_multiple))
    padded_shape = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pads))

    n_dev = mesh.shape["data"]
    starts_np = compute_window_starts(padded_shape, roi, spec.overlap)
    n = starts_np.shape[0]
    chunk = spec.sw_batch * n_dev
    n_pad = (-n) % chunk
    if n_pad:
        starts_np = np.concatenate(
            [starts_np, np.zeros((n_pad, 3), dtype=np.int32)], axis=0
        )
    valid_np = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    n_batches = starts_np.shape[0] // spec.sw_batch
    starts = jnp.asarray(starts_np.reshape(n_batches, spec.sw_batch, 3))
    valid = jnp.asarray(valid_np.reshape(n_batches, spec.sw_batch))
    imp = jnp.asarray(
        constant_importance(roi)
        if spec.mode == "constant"
        else gaussian_importance(roi, spec.sigma_scale)
    )
    inv_count = jnp.asarray(
        1.0
        / _count_map_cached(padded_shape, roi, spec.overlap, spec.mode, spec.sigma_scale)
    )

    vol = jnp.asarray(volume)
    if any(lo or hi for lo, hi in pads):
        vol = jnp.pad(vol, list(pads) + [(0, 0)])

    rd, rh, rw = roi
    c = vol.shape[-1]
    channels_first = out_layout == "ndchw"
    flatk = out_layout == "flatk"
    k16 = _flatk_pad(n_classes)

    def local_accumulate(params, vol, starts_l, valid_l, imp):
        if flatk:
            acc = jnp.zeros(
                (vol.shape[0], vol.shape[1], vol.shape[2] * k16), jnp.float32
            )
            impx = imp[..., None]
        elif channels_first:
            acc = jnp.zeros(
                (vol.shape[0], n_classes) + vol.shape[1:3], dtype=jnp.float32
            )
            impx = imp[:, None]  # (rd, 1, rh, rw)
        else:
            acc = jnp.zeros(vol.shape[:3] + (n_classes,), dtype=jnp.float32)
            impx = imp[..., None]

        def gather(start):
            return jax.lax.dynamic_slice(
                vol, (start[0], start[1], start[2], 0), (rd, rh, rw, c)
            )

        def step(acc, batch):
            st, va = batch
            windows = jax.vmap(gather)(st)
            logits = apply_fn(params, windows)
            if flatk and logits.shape[-1] != k16:
                logits = jnp.pad(logits, [(0, 0)] * 4 + [(0, k16 - logits.shape[-1])])
            weighted = (
                logits.astype(jnp.float32) * impx[None] * va[:, None, None, None, None]
            ).astype(logits.dtype)
            if flatk:
                weighted = weighted.reshape(spec.sw_batch, rd, rh, rw * k16)

            def scatter(i, a):
                s = st[i]
                if flatk:
                    idx = (s[0], s[1], s[2] * k16)
                    blk = (rd, rh, rw * k16)
                elif channels_first:
                    idx = (s[0], 0, s[1], s[2])
                    blk = (rd, n_classes, rh, rw)
                else:
                    idx = (s[0], s[1], s[2], 0)
                    blk = (rd, rh, rw, n_classes)
                cur = jax.lax.dynamic_slice(a, idx, blk)
                return jax.lax.dynamic_update_slice(
                    a, cur + weighted[i].astype(jnp.float32), idx
                )

            return jax.lax.fori_loop(0, spec.sw_batch, scatter, acc), None

        acc, _ = jax.lax.scan(step, acc, (starts_l, valid_l))
        return jax.lax.psum(acc, "data")

    sharded = shard_map(
        local_accumulate,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=P(),
        check_vma=False,
    )
    acc = jax.jit(sharded)(params, vol, starts, valid, imp)
    if flatk:
        acc = acc.reshape(vol.shape[:3] + (k16,))[..., :n_classes]
    elif channels_first:
        acc = acc.transpose(0, 2, 3, 1)
    out = acc * inv_count[..., None]
    sl = tuple(slice(lo, lo + s) for (lo, _), s in zip(pads, spatial))
    out = out[sl]
    if squeeze:
        out = out[None]
    return out
