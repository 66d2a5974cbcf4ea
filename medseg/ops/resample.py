"""Device-side (XLA/TPU) affine resampling — the `Spacingd` hot path on HBM.

Capability contract: MONAI 0.6 ``Spacingd`` resampling as used by the
reference (`/root/reference/unetr_segmentation_3d.py:326-330` — image
bilinear/trilinear, label nearest, border-clamped sampling through the
voxel->voxel affine). Host-side twin: ``medseg.data.transforms.respace``
(C++/OpenMP or numpy); this module is the TPU-native third backend named by
the north-star ("respacing fused into device kernels feeding the loader").

Design: the resample matrix is per-volume HOST data (computed from NIfTI
affines by the same `zoom_affine`/`compute_shape_offset` rules), so the
interpolation structure is built host-side and the device program is pure
dense math:

- **Separable path** (axis-aligned affines — the common case after
  ``Orientationd`` on near-orthogonal scans): per-axis (out_i, in_i)
  interpolation-weight matrices, applied as three tensordots. Dense matmuls
  on the MXU; trilinear == product of per-axis linear weights exactly.
- **General path** (oblique affines): one fused gather of the 8 corner
  voxels with border-clamped indices (XLA gather; bandwidth-bound).

The intensity windowing chain (`ScaleIntensityRanged`, seg :332-339) fuses
into the same jit — clip+affine runs on the resampled tensor while it is
still in registers/VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(scale: float, offset: float, n_out: int, n_in: int,
                  mode: str) -> np.ndarray:
    """(n_out, n_in) interpolation matrix for out coord c = scale*i + offset,
    border-clamped (torch grid_sample padding_mode="border" semantics, the
    MONAI Spacing default — matches transforms._trilinear_sample)."""
    c = scale * np.arange(n_out, dtype=np.float64) + offset
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if mode == "nearest":
        idx = np.clip(np.round(c), 0, n_in - 1).astype(np.int64)
        w[np.arange(n_out), idx] = 1.0
        return w
    c = np.clip(c, 0.0, n_in - 1.0)
    c0 = np.floor(c).astype(np.int64)
    c1 = np.minimum(c0 + 1, n_in - 1)
    frac = (c - c0).astype(np.float32)
    np.add.at(w, (np.arange(n_out), c0), 1.0 - frac)
    np.add.at(w, (np.arange(n_out), c1), frac)
    return w


def _is_axis_aligned(matrix: np.ndarray, tol: float = 1e-9) -> bool:
    off = matrix[:3, :3].copy()
    np.fill_diagonal(off, 0.0)
    return bool(np.abs(off).max() <= tol)


def _apply_window(out, window):
    """Fused ScaleIntensityRanged epilogue (one definition — the identity,
    separable and gather resample paths must window identically)."""
    if window is None:
        return out
    a_min, a_max, b_min, b_max, clip = window
    out = (out - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    if clip:
        out = jnp.clip(out, min(b_min, b_max), max(b_min, b_max))
    return out


@partial(jax.jit, static_argnames=("window",))
def _separable_apply(vol, wx, wy, wz, window=None):
    # vol (X, Y, Z, C); w* (out_i, in_i)
    out = jnp.einsum("ax,xyzc->ayzc", wx, vol)
    out = jnp.einsum("by,ayzc->abzc", wy, out)
    out = jnp.einsum("dz,abzc->abdc", wz, out)
    return _apply_window(out, window)


def _gather_coords(matrix: np.ndarray, out_shape, in_shape, mode: str):
    """HOST fp64 coordinate precompute for the general (oblique) path —
    index rounding at half boundaries must match the fp64 host/torch
    reference exactly, which fp32 on-device coords cannot guarantee."""
    grid = np.stack(
        np.meshgrid(*[np.arange(n, dtype=np.float64) for n in out_shape],
                    indexing="ij"),
        axis=-1,
    )
    coords = grid @ matrix[:3, :3].T + matrix[:3, 3]
    shape = np.asarray(in_shape, np.float64)
    if mode == "nearest":
        idx = np.clip(np.round(coords), 0, shape - 1).astype(np.int32)
        return idx, None, None
    c = np.clip(coords, 0.0, shape - 1.0)
    c0 = np.floor(c)
    frac = (c - c0).astype(np.float32)
    c0i = c0.astype(np.int32)
    c1i = np.minimum(c0i + 1, np.asarray(in_shape, np.int32) - 1)
    return c0i, c1i, frac


@partial(jax.jit, static_argnames=("mode", "window"))
def _gather_apply(vol, c0i, c1i, frac, mode, window=None):
    if mode == "nearest":
        out = vol[c0i[..., 0], c0i[..., 1], c0i[..., 2]]
    else:
        out = None
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ix = c1i[..., 0] if dx else c0i[..., 0]
                    iy = c1i[..., 1] if dy else c0i[..., 1]
                    iz = c1i[..., 2] if dz else c0i[..., 2]
                    ww = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    term = vol[ix, iy, iz] * ww[..., None]
                    out = term if out is None else out + term
    return _apply_window(out, window)


def affine_resample_device(
    vol: jax.Array,
    matrix: np.ndarray,  # (3, 4) or (4, 4): out voxel -> in voxel (HOST data)
    out_shape: tuple[int, int, int],
    mode: str = "trilinear",
    window: tuple | None = None,  # (a_min, a_max, b_min, b_max, clip) fused
) -> jax.Array:
    """Resample a (X, Y, Z[, C]) volume on device. Returns float32
    (X', Y', Z'[, C]). ``window`` fuses a ScaleIntensityRange epilogue."""
    matrix = np.asarray(matrix, dtype=np.float64)
    squeeze = vol.ndim == 3
    v = vol[..., None] if squeeze else vol
    v = jnp.asarray(v, jnp.float32)
    if _is_axis_aligned(matrix):
        ws = [
            jnp.asarray(
                _axis_weights(
                    matrix[i, i], matrix[i, 3], out_shape[i], v.shape[i], mode
                )
            )
            for i in range(3)
        ]
        out = _separable_apply(v, *ws, window=window)
    else:
        c0i, c1i, frac = _gather_coords(matrix, out_shape, v.shape[:3], mode)
        if mode == "nearest":
            c1i = jnp.zeros((), jnp.int32)
            frac = jnp.zeros((), jnp.float32)
        out = _gather_apply(
            v, jnp.asarray(c0i), jnp.asarray(c1i), jnp.asarray(frac), mode,
            window=window,
        )
    return out[..., 0] if squeeze else out


def orient_ras_device(sample: dict, keys=("image", "label")) -> dict:
    """Device twin of ``transforms.orient_ras``: the permutation/flip
    decision comes from the HOST affine (tiny), the array movement runs as
    ``jnp.flip``/``jnp.transpose`` on device."""
    from medseg.data.transforms import _io_orientation

    out = dict(sample)
    for key in keys:
        if key not in out or f"{key}_affine" not in out:
            continue
        data = jnp.asarray(out[key])
        affine = np.asarray(out[f"{key}_affine"], dtype=np.float64)
        ornt = _io_orientation(affine)
        spatial_shape = data.shape[:3]
        flips = [int(ax) for ax, (_, sign) in enumerate(ornt) if sign < 0]
        if flips:
            data = jnp.flip(data, axis=flips)
        perm = np.argsort(ornt[:, 0])
        extra = list(range(3, data.ndim))
        data = jnp.transpose(data, list(perm) + extra)
        t_flip = np.eye(4)
        for ax in flips:
            t_flip[ax, ax] = -1.0
            t_flip[ax, 3] = spatial_shape[ax] - 1
        t_perm = np.zeros((4, 4))
        t_perm[3, 3] = 1.0
        for new_ax, old_ax in enumerate(perm):
            t_perm[old_ax, new_ax] = 1.0
        out[key] = data
        out[f"{key}_affine"] = affine @ t_flip @ t_perm
    return out


@jax.jit
def _foreground_bbox_device(src: jax.Array):
    """Per-axis any-reduction of ``src > 0`` -> 6 scalars (fetched to host
    for the dynamic-shape crop)."""
    fg = src > 0
    if fg.ndim == 4:
        fg = fg.any(axis=-1)
    outs = []
    for ax in range(3):
        axes = tuple(a for a in range(3) if a != ax)
        line = fg.any(axis=axes)
        idx = jnp.arange(line.shape[0])
        any_fg = line.any()
        lo = jnp.where(any_fg, jnp.min(jnp.where(line, idx, line.shape[0])), 0)
        hi = jnp.where(any_fg, jnp.max(jnp.where(line, idx, -1)) + 1, line.shape[0])
        outs.append((lo, hi))
    return outs, fg.any()


def crop_foreground_device(sample: dict, source_key: str = "image",
                           keys=("image", "label"), margin: int = 0) -> dict:
    """Device twin of ``transforms.crop_foreground``: bbox reduced on device
    (6 scalars fetched), slice applied to the device arrays."""
    out = dict(sample)
    src = jnp.asarray(out[source_key])
    bounds, any_fg = jax.device_get(_foreground_bbox_device(src))
    if not bool(any_fg):  # host twin: all-background volumes pass untouched
        return out
    starts = [max(int(lo) - margin, 0) for lo, _ in bounds]
    stops = [
        min(int(hi) + margin, s) for (_, hi), s in zip(bounds, src.shape[:3])
    ]
    if all(a == 0 for a in starts) and all(
        b == s for b, s in zip(stops, src.shape[:3])
    ):
        # full-extent bbox: no crop, but keep the key set exactly like the
        # host twin (transforms.crop_foreground) so downstream consumers
        # (crop inversion) see identical samples from either pipeline
        out["foreground_start"] = np.asarray(starts, dtype=np.int64)
        return out
    sl = tuple(slice(a, b) for a, b in zip(starts, stops))
    for key in keys:
        if key in out:
            out[key] = jnp.asarray(out[key])[sl]
    out["foreground_start"] = np.asarray(starts, dtype=np.int64)
    return out


def respace_device(sample: dict, pixdim, keys=("image", "label"),
                   modes=("trilinear", "nearest"), window: tuple | None = None):
    """Device twin of ``medseg.data.transforms.respace``: same MONAI
    ``zoom_affine``/``compute_shape_offset`` geometry (computed host-side),
    resample executed on device. ``window`` fuses intensity windowing into
    the image resample (CT `ScaleIntensityRanged`)."""
    from medseg.data.transforms import _compute_shape_offset, _zoom_affine

    out = dict(sample)
    pixdim = np.asarray(pixdim, dtype=np.float64)
    for key, mode in zip(keys, modes):
        if key not in out or f"{key}_affine" not in out:
            continue
        data = out[key]
        affine = np.asarray(out[f"{key}_affine"], dtype=np.float64)
        in_shape = np.array(np.shape(data)[:3])
        new_affine = _zoom_affine(affine, pixdim)
        new_shape, offset = _compute_shape_offset(in_shape, affine, new_affine)
        new_affine[:3, 3] = offset
        m = np.linalg.inv(affine) @ new_affine
        win = window if (key == "image" and window is not None) else None
        if np.array_equal(new_shape, in_shape) and np.allclose(m, np.eye(4)):
            res = _apply_window(jnp.asarray(np.asarray(data), jnp.float32), win)
        else:
            res = affine_resample_device(
                jnp.asarray(np.asarray(data)), m, tuple(int(x) for x in new_shape),
                mode, window=win,
            )
        out[key] = res
        out[f"{key}_affine"] = new_affine
    return out
