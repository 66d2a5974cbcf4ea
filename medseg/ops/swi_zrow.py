"""Sliding-window inference, z-row walk + deferred overlap-add (round 3).

Same MONAI 0.6 ``sliding_window_inference`` contract as
``medseg.ops.sliding_window`` (`/root/reference/unetr_segmentation_3d.py:109,
143,694-695`), rebuilt around the round-2 finding that the per-window
slice+``dynamic_update_slice`` scatter was 55% of the serving budget
(docs/PERF_NOTES.md: 16.4 of 29.7 ms/batch, bound by DMA run count — window
rows are ~1.5KB runs inside the big accumulator).

Design: never scatter a window into the volume accumulator at all.

1. **Structured walk** — instead of a flat window list, iterate the grid as
   ``scan(d_starts) x scan(h_starts) x static w_starts``. Per (d0, h0) the
   gather is ONE ``dynamic_slice`` rowblock ``(rd, rh, W_full, C)`` whose
   offsets are major-dim only (contiguous ~rh*W*4-byte runs instead of
   per-window ~384-byte runs), and the ``n_w`` windows of the rowblock are
   STATIC lane slices (w starts are trace-time constants).
2. **Deferred overlap-add ("fold")** — the model emits parity-plane windows
   ``(n_w, rd, 4, rh/2, (rw/2)*K16)`` (``fast_apply_v3(pp=True)`` form, blend
   weight folded into the out-head epilogue). Overlapping windows are then
   combined axis-by-axis with static **interval-decomposition folds**: between
   two consecutive breakpoints of the start/end set, the covering window set
   is constant, so each output segment is a plain sum of static slices and the
   axis result is one concat. W folds per (d0, h0) row, H folds per z-row,
   D folds once per volume over the scan-stacked slabs. Every op is a static
   slice / add / concat — zero read-modify-write scatter, zero DUS.

Traffic: windows are written once by the model (contiguous scan ``ys``), each
fold level reads its input once and writes once (~2.5x volume bytes total),
vs the scatter's per-window RMW of the full accumulator region. No grid
padding windows exist (the walk is exact), so no validity mask either.

Geometry requirements (checked by ``zrow_supported``): even roi/pads/starts in
H and W (the parity-plane form), i.e. the same predicate as ``ppk_supported``.
Fallback for other grids: the ppk/flatk scatter paths in
``medseg.ops.sliding_window``.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from medseg.ops.sliding_window import (
    SlidingWindowSpec,
    _count_map_cached,
    _flatk_pad,
    _pad_amounts,
    constant_importance,
    gaussian_importance,
    per_dim_window_starts,
    ppk_supported,
    ppk_zpack,
)

# zrow consumes the same parity-plane window form as the ppk scatter, so the
# geometry predicate is identical.
zrow_supported = ppk_supported


def _apply_fn_zpack(apply_fn) -> bool:
    """Whether ``apply_fn`` accepts the ``zpack`` keyword (the z-packed ppk
    window form, round 5). Closures that don't are fed unpacked windows."""
    import inspect

    try:
        sig = inspect.signature(apply_fn)
    except (TypeError, ValueError):
        return False
    if "zpack" in sig.parameters:
        return True
    return any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )


def _apply_fn_w_fold(apply_fn) -> bool:
    """Whether ``apply_fn`` accepts the ``w_fold`` keyword (in-kernel
    W-fold: the out head overlap-adds the n_w windows of a rowblock and
    returns folded rows — per-window logits never round-trip HBM)."""
    import inspect

    try:
        sig = inspect.signature(apply_fn)
    except (TypeError, ValueError):
        return False
    if "w_fold" in sig.parameters:
        return True
    return any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )


def _wfold_on() -> bool:
    return os.environ.get("MEDSEG_WFOLD", "1") == "1"


def _grid_zpack(apply_fn, rd: int, n_classes: int, d_starts, dp: int) -> int:
    """z-packing factor for this walk: the shape rule (``ppk_zpack``) AND
    the d-grid divisibility the packed D-fold needs AND apply_fn support."""
    zp = ppk_zpack(rd, n_classes)
    if zp == 1 or not _apply_fn_zpack(apply_fn):
        return 1
    if dp % zp or any(int(s) % zp for s in d_starts):
        return 1
    return zp


def _fold_plan(
    offsets: Sequence[int], width: int, total: int
) -> tuple[tuple[int, int, tuple[tuple[int, int], ...]], ...]:
    """Interval decomposition of an overlap-add.

    Windows of ``width`` sit at ``offsets`` (sorted, covering [0, total)).
    Returns segments ``(start, length, ((win_idx, local_off), ...))`` such
    that output[start:start+length] = sum over covering windows of
    window[win_idx][local_off:local_off+length].
    """
    offs = list(offsets)
    bps = sorted({0, total} | set(offs) | {o + width for o in offs})
    bps = [b for b in bps if 0 <= b <= total]
    segs = []
    for a, b in zip(bps[:-1], bps[1:]):
        cover = tuple(
            (j, a - o) for j, o in enumerate(offs) if o <= a and b <= o + width
        )
        assert cover, f"window grid leaves [{a}, {b}) uncovered"
        segs.append((a, b - a, cover))
    return tuple(segs)


def _fold(stacked: jax.Array, segs, axis: int) -> jax.Array:
    """Apply a ``_fold_plan`` along ``axis`` of ``stacked`` (window-stacked on
    axis 0; ``axis`` counts dims of one window). All slices static."""
    parts = []
    for _, length, cover in segs:
        term = None
        for j, off in cover:
            piece = jax.lax.slice_in_dim(stacked[j], off, off + length, axis=axis)
            term = piece if term is None else term + piece
        parts.append(term)
    return jnp.concatenate(parts, axis=axis)


@lru_cache(maxsize=32)
def _device_constants_cached(padded, roi, overlap, mode, sigma_scale):
    """Device-resident grid constants, uploaded ONCE per (shape, spec) —
    re-uploading the ~volume-sized reciprocal count map per call through the
    host relay dominated everything in round 1 (docs/PERF_NOTES.md)."""
    d_starts, h_starts, _ = per_dim_window_starts(padded, roi, overlap)
    imp_np = (
        constant_importance(roi)
        if mode == "constant"
        else gaussian_importance(roi, sigma_scale)
    )
    inv_count = 1.0 / _count_map_cached(padded, roi, overlap, mode, sigma_scale)
    return (
        jnp.asarray(np.asarray(d_starts, np.int32)),
        jnp.asarray(np.asarray(h_starts, np.int32)),
        jnp.asarray(imp_np),
        jnp.asarray(inv_count),
    )


def _make_d_body(
    params,
    volume: jax.Array,  # (Dp, Hp, Wp, C) padded
    h_starts: jax.Array,  # (nh,) int32
    importance: jax.Array,  # (rd, rh, rw) fp32
    inv_count: jax.Array,  # (Dp, Hp, Wp) fp32 reciprocal count map
    *,
    apply_fn: Callable,
    roi: tuple[int, int, int],
    w_starts: tuple[int, ...],
    h_segs,
    w_segs,
    fold_dtype,
    h_group: int,
    zpack: int = 1,
    w_fold: bool = False,
) -> Callable:
    """Build the per-d0 slab scan body shared by the single-device walk and
    the mesh-sharded walk: scan(h-rowblocks) x static w-windows -> one
    H/W-folded slab ``(rd, 4, Hp/2, (Wp/2)*K16)`` (z dims and the lane K16
    scale by ``zpack`` for the z-packed window form). With ``w_fold`` the
    W-fold happens inside the model's out-head kernel (apply_fn returns
    folded rows directly) and the XLA ``_fold(w_segs)`` pass is skipped."""
    rd, rh, rw = roi
    _, _, wp_full, c = volume.shape
    imp = importance[None, ..., None]  # (1, rd, rh, rw, 1)
    n_w = len(w_starts)
    g = h_group

    def h_body(_, start):
        d0, h0s = start[0][0], start[1]  # scalar, (g,)

        def rowblock(h0):
            rb = jax.lax.dynamic_slice(
                volume, (d0, h0, 0, 0), (rd, rh, wp_full, c)
            )
            ib = jax.lax.dynamic_slice(inv_count, (d0, h0, 0), (rd, rh, wp_full))
            return rb, ib

        rbs, ibs = jax.vmap(rowblock)(h0s)  # (g, rd, rh, Wp, C), (g, rd, rh, Wp)
        wins = jnp.stack(
            [jax.lax.slice_in_dim(rbs, ws, ws + rw, axis=3) for ws in w_starts]
        )  # (n_w, g, rd, rh, rw, C)
        wgt = (
            jnp.stack(
                [jax.lax.slice_in_dim(ibs, ws, ws + rw, axis=3) for ws in w_starts]
            )[..., None]
            * imp[None]
        )  # (n_w, g, rd, rh, rw, 1)
        flat = lambda t: t.reshape((n_w * g,) + t.shape[2:])
        if w_fold:
            row = apply_fn(
                params, flat(wins), flat(wgt), zpack=zpack,
                w_fold=(n_w, tuple(ws // 2 for ws in w_starts), wp_full // 2),
            ).astype(fold_dtype)
        elif zpack > 1:
            ppw = apply_fn(params, flat(wins), flat(wgt), zpack=zpack)
            # (n_w*g, rd/zp, 4, rh/2, LWr*zp)
            ppw = ppw.reshape((n_w, g) + ppw.shape[1:])
            row = _fold(ppw.astype(fold_dtype), w_segs, axis=4)
        else:
            ppw = apply_fn(params, flat(wins), flat(wgt))
            ppw = ppw.reshape((n_w, g) + ppw.shape[1:])
            row = _fold(ppw.astype(fold_dtype), w_segs, axis=4)
        return None, row  # (g, rd/zp, 4, rh/2, (Wp/2)*zp*K16)

    def d_body(_, d0):
        starts = (
            jnp.broadcast_to(d0, (h_starts.shape[0] // g, g)),
            h_starts.reshape(-1, g),
        )
        _, rows = jax.lax.scan(h_body, None, starts)  # (nh/g, g, rd/zp, 4, rh/2, LW)
        rows = rows.reshape((-1,) + rows.shape[2:])  # (nh, ...)
        slab = _fold(rows, h_segs, axis=2)  # (rd/zp, 4, Hp/2, LW)
        return None, slab

    return d_body


def _deinterleave_crop(acc, pads, out_shape, n_classes, zpack: int = 1):
    """Parity-plane deinterleave (same as the ppk scatter tail) + pad crop.
    ``zpack > 1``: also unpack the z-packed lane groups (minor order
    (ww, z-in-pack, k)) back to major z — still one pass per volume."""
    dpz, _, hp2, lw = acc.shape
    k16 = _flatk_pad(n_classes)
    if zpack > 1:
        wp2 = lw // (zpack * k16)
        acc = acc.reshape(dpz, 2, 2, hp2, wp2, zpack, k16)
        # (dblk, jy, lx, hh, ww, jz, k) -> (dblk, jz, hh, jy, ww, lx, k)
        acc = acc.transpose(0, 5, 3, 1, 4, 2, 6).reshape(
            dpz * zpack, hp2 * 2, wp2 * 2, k16
        )
    else:
        wp2 = lw // k16
        acc = acc.reshape(dpz, 2, 2, hp2, wp2, k16)
        acc = acc.transpose(0, 3, 1, 4, 2, 5).reshape(dpz, hp2 * 2, wp2 * 2, k16)
    begin = tuple(lo for lo, _ in pads) + (0,)
    return jax.lax.dynamic_slice(acc, begin, out_shape + (n_classes,)).astype(
        jnp.float32
    )


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "roi", "n_classes", "pads", "out_shape",
        "w_starts", "h_segs", "w_segs", "acc_dtype", "h_group",
        "zpack", "w_fold",
    ),
)
def _zrow_device(
    params,
    volume: jax.Array,  # (D, H, W, C) unpadded
    d_starts: jax.Array,  # (nd,) int32
    h_starts: jax.Array,  # (nh,) int32
    importance: jax.Array,  # (rd, rh, rw) fp32
    inv_count: jax.Array,  # (Dp, Hp, Wp) fp32 reciprocal count map
    *,
    apply_fn: Callable,
    roi: tuple[int, int, int],
    n_classes: int,
    pads: tuple[tuple[int, int], ...],
    out_shape: tuple[int, int, int],
    w_starts: tuple[int, ...],
    h_segs,  # fold plans (static)
    w_segs,
    acc_dtype: str = "bf16",
    h_group: int = 1,  # h-rows per model call (batch = h_group * n_w)
    zpack: int = 1,  # z-packed window form (slab adds in zp units)
    w_fold: bool = False,  # W-fold inside the out-head kernel
) -> jax.Array:
    if any(lo or hi for lo, hi in pads):
        volume = jnp.pad(volume, list(pads) + [(0, 0)])
    fold_dtype = jnp.bfloat16 if acc_dtype == "bf16" else jnp.float32
    d_body = _make_d_body(
        params, volume, h_starts, importance, inv_count,
        apply_fn=apply_fn, roi=roi, w_starts=w_starts,
        h_segs=h_segs, w_segs=w_segs, fold_dtype=fold_dtype, h_group=h_group,
        zpack=zpack, w_fold=w_fold,
    )
    # D-fold as a running accumulator in the scan carry (the sharded walk's
    # pattern): slabs add at their (major-dim) d-offsets as they are
    # produced, so the (nd, slab) stack never materializes — at the
    # headline grid that stack (~2.4 GB) plus the packed deinterleave's
    # transpose intermediate pushed the route over HBM (round-5 OOM).
    # The adds are 3-4 contiguous major-dim DUS per volume, not a scatter.
    dpz = volume.shape[0] // zpack

    def step(acc, d0):
        slab = d_body(None, d0)[1]  # (rd/zp, 4, Hp/2, LW)
        s = d0 // zpack
        cur = jax.lax.dynamic_slice(acc, (s, 0, 0, 0), slab.shape)
        return (
            jax.lax.dynamic_update_slice(acc, cur + slab, (s, 0, 0, 0)),
            None,
        )

    hp2 = volume.shape[1] // 2
    lw = (volume.shape[2] // 2) * zpack * _flatk_pad(n_classes)
    acc0 = jnp.zeros((dpz, 4, hp2, lw), fold_dtype)
    acc, _ = jax.lax.scan(step, acc0, d_starts)
    return _deinterleave_crop(acc, pads, out_shape, n_classes, zpack=zpack)


def _pick_h_group(nh: int, n_w: int, target_batch: int | None = None) -> int:
    """Largest divisor of nh keeping the model batch (h_group * n_w) within
    ``target_batch`` — per-window model cost drops with batch (measured
    3.17/2.86/2.79/2.68 ms/window at batch 3/4/6/8, benchmarks/profile_zrow).
    Default target is the MEDSEG_ZROW_TB env knob (8): bigger batches also
    grow the ViT matmuls' M dimension toward the MXU ceiling, at the cost of
    larger live intermediates — sweepable on hardware."""
    if target_batch is None:
        target_batch = int(os.environ.get("MEDSEG_ZROW_TB", "8"))
    best = 1
    for g in range(2, nh + 1):
        if nh % g == 0 and g * n_w <= target_batch:
            best = g
    return best


def sliding_window_inference_zrow_sharded(
    params,
    volume,
    apply_fn: Callable,
    n_classes: int,
    spec: SlidingWindowSpec,
    mesh,
    acc_dtype: str = "bf16",
    h_group: int | None = None,
) -> jax.Array:
    """Mesh-sharded z-row walk: d-slabs of the walk distributed over the
    ``data`` axis, one ``psum`` merges the folded accumulators.

    Context parallelism over volume space (SURVEY.md §5 long-context row)
    carrying the round-3 serving engine to multi-chip eval: each device runs
    the zrow walk (same ppk ``apply_fn`` contract as
    ``sliding_window_inference_zrow``) over its subset of the d-axis window
    starts, H/W-folds locally, then adds its slabs into a full-depth
    accumulator at their (major-dim) d-offsets — the D-fold is linear in
    slabs, so the cross-device combine is one ``lax.psum`` over ICI. No halo
    exchange: slabs overlap only in the accumulator. Bitwise semantics match
    the single-device walk up to fp addition order in the D-overlap regions.
    """
    squeeze = False
    if volume.ndim == 5:
        if volume.shape[0] != 1:
            raise ValueError("sliding_window_inference expects a single volume")
        volume = volume[0]
        squeeze = True
    spatial = tuple(int(s) for s in volume.shape[:3])
    roi = tuple(spec.roi)
    if not zrow_supported(spatial, spec):
        raise ValueError(
            "zrow walk requires even roi/pads and even window starts; "
            "use the sharded flatk scatter for this grid"
        )
    rd, rh, rw = roi
    k16 = _flatk_pad(n_classes)
    pads = tuple(_pad_amounts(spatial, roi, spec.bucket_multiple))
    padded = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pads))
    dp, hp, wp_full = padded

    d_starts, h_starts, w_starts = per_dim_window_starts(padded, roi, spec.overlap)
    zp = _grid_zpack(apply_fn, rd, n_classes, d_starts, dp)
    wf = zp > 1 and _wfold_on() and _apply_fn_w_fold(apply_fn)
    lk = zp * k16
    h_segs = _fold_plan([int(s) // 2 for s in h_starts], rh // 2, hp // 2)
    w_segs = _fold_plan(
        [(int(s) // 2) * lk for s in w_starts], (rw // 2) * lk, (wp_full // 2) * lk
    )
    if h_group is None:
        h_group = _pick_h_group(len(h_starts), len(w_starts))

    n_dev = mesh.shape["data"]
    d_np = np.asarray(d_starts, np.int32)
    n_pad = (-len(d_np)) % n_dev
    valid_np = np.concatenate([np.ones(len(d_np), np.float32), np.zeros(n_pad)])
    d_np = np.concatenate([d_np, np.zeros(n_pad, np.int32)])

    _, h_starts_dev, imp_dev, inv_count_dev = _device_constants_cached(
        padded, roi, spec.overlap, spec.mode, spec.sigma_scale
    )

    out = _zrow_sharded_device(
        params, jnp.asarray(volume), inv_count_dev, imp_dev,
        jnp.asarray(d_np), jnp.asarray(valid_np), h_starts_dev,
        apply_fn=apply_fn, roi=roi, n_classes=n_classes, pads=pads,
        out_shape=spatial, w_starts=tuple(int(s) for s in w_starts),
        h_segs=h_segs, w_segs=w_segs, acc_dtype=acc_dtype, h_group=h_group,
        mesh=mesh, zpack=zp, w_fold=wf,
    )
    if squeeze:
        out = out[None]
    return out


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "roi", "n_classes", "pads", "out_shape",
        "w_starts", "h_segs", "w_segs", "acc_dtype", "h_group", "mesh",
        "zpack", "w_fold",
    ),
)
def _zrow_sharded_device(
    params,
    volume: jax.Array,  # (D, H, W, C) unpadded
    inv_count: jax.Array,
    importance: jax.Array,
    d_starts_all: jax.Array,  # (nd_padded,) int32, padded to mesh divisibility
    valid_all: jax.Array,  # (nd_padded,) fp32 1/0 validity of each d-start
    h_starts: jax.Array,
    *,
    apply_fn: Callable,
    roi: tuple[int, int, int],
    n_classes: int,
    pads: tuple[tuple[int, int], ...],
    out_shape: tuple[int, int, int],
    w_starts: tuple[int, ...],
    h_segs,
    w_segs,
    acc_dtype: str,
    h_group: int,
    mesh,
    zpack: int = 1,
    w_fold: bool = False,
) -> jax.Array:
    """Module-level jitted entry for the sharded zrow walk: same static-key
    caching as ``_zrow_device`` so repeat volumes at the same padded shape
    reuse the compiled executable instead of rebuilding fresh shard_map/jit
    closures per call (round-4 advisor finding — this is the default mesh
    eval route)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if any(lo or hi for lo, hi in pads):
        volume = jnp.pad(volume, list(pads) + [(0, 0)])
    dp = volume.shape[0]
    fold_dtype = jnp.bfloat16 if acc_dtype == "bf16" else jnp.float32

    def local_walk(params, vol, inv_count_l, imp_l, h_starts_l, d_starts_l, valid_l):
        d_body = _make_d_body(
            params, vol, h_starts_l, imp_l, inv_count_l,
            apply_fn=apply_fn, roi=roi, w_starts=w_starts,
            h_segs=h_segs, w_segs=w_segs, fold_dtype=fold_dtype, h_group=h_group,
            zpack=zpack, w_fold=w_fold,
        )
        _, slabs = jax.lax.scan(d_body, None, d_starts_l)  # (nd_l, rd/zp, ...)
        acc = jnp.zeros((dp // zpack,) + slabs.shape[2:], fold_dtype)

        def add(i, a):
            s = d_starts_l[i] // zpack  # _grid_zpack guarantees divisibility
            cur = jax.lax.dynamic_slice(a, (s, 0, 0, 0), slabs.shape[1:])
            return jax.lax.dynamic_update_slice(
                a, cur + slabs[i] * valid_l[i].astype(fold_dtype), (s, 0, 0, 0)
            )

        acc = jax.lax.fori_loop(0, d_starts_l.shape[0], add, acc)
        return jax.lax.psum(acc, "data")

    sharded = shard_map(
        local_walk,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    acc = sharded(
        params, volume, inv_count, importance, h_starts, d_starts_all, valid_all
    )
    return _deinterleave_crop(acc, pads, out_shape, n_classes, zpack=zpack)


def sliding_window_inference_zrow(
    params,
    volume,
    apply_fn: Callable,
    n_classes: int,
    spec: SlidingWindowSpec,
    acc_dtype: str = "bf16",
    h_group: int | None = None,
) -> jax.Array:
    """Whole-volume inference via the z-row walk (see module docstring).

    ``apply_fn(params, windows, wgt)`` must emit parity-plane windows
    ``(B, rd, 4, rh/2, (rw/2)*K16)`` with the blend weight folded in — the
    same contract as the ppk scatter (``fast_apply_v3(pp=True,
    flat_k16=True, out_scale=wgt)``). The model batch is the number of
    w-axis windows per rowblock (``spec.sw_batch`` is not used).

    Returns (D, H, W, K) fp32 blended logits at the original size (or
    (1, ...) for a 5-D input), identical semantics to
    ``sliding_window_inference``.
    """
    squeeze = False
    if volume.ndim == 5:
        if volume.shape[0] != 1:
            raise ValueError("sliding_window_inference expects a single volume")
        volume = volume[0]
        squeeze = True
    spatial = tuple(int(s) for s in volume.shape[:3])
    roi = tuple(spec.roi)
    if not zrow_supported(spatial, spec):
        raise ValueError(
            "zrow walk requires even roi/pads and even window starts; "
            "use out_layout='flatk' for this grid"
        )
    rd, rh, rw = roi
    k16 = _flatk_pad(n_classes)
    pads = tuple(_pad_amounts(spatial, roi, spec.bucket_multiple))
    padded = tuple(s + lo + hi for s, (lo, hi) in zip(spatial, pads))
    dp, hp, wp_full = padded

    d_starts, h_starts, w_starts = per_dim_window_starts(padded, roi, spec.overlap)
    zp = _grid_zpack(apply_fn, rd, n_classes, d_starts, dp)
    wf = zp > 1 and _wfold_on() and _apply_fn_w_fold(apply_fn)
    lk = zp * k16  # lane elements per half-voxel column
    h_segs = _fold_plan([int(s) // 2 for s in h_starts], rh // 2, hp // 2)
    w_segs = _fold_plan(
        [(int(s) // 2) * lk for s in w_starts], (rw // 2) * lk, (wp_full // 2) * lk
    )

    if h_group is None:
        h_group = _pick_h_group(len(h_starts), len(w_starts))

    d_starts_dev, h_starts_dev, imp_dev, inv_count_dev = _device_constants_cached(
        padded, roi, spec.overlap, spec.mode, spec.sigma_scale
    )

    out = _zrow_device(
        params,
        jnp.asarray(volume),
        d_starts_dev,
        h_starts_dev,
        imp_dev,
        inv_count_dev,
        apply_fn=apply_fn,
        roi=roi,
        n_classes=n_classes,
        pads=pads,
        out_shape=spatial,
        w_starts=tuple(int(s) for s in w_starts),
        h_segs=h_segs,
        w_segs=w_segs,
        acc_dtype=acc_dtype,
        h_group=h_group,
        zpack=zp,
        w_fold=wf,
    )
    if squeeze:
        out = out[None]
    return out
