"""Generate sliding-window blend goldens from an INDEPENDENT torch loop.

MONAI 0.6 is not installable in this image (SURVEY.md §4.1), so the fixture
is produced by a from-scratch torch re-creation of MONAI 0.6
``sliding_window_inference`` semantics (`monai/inferers/utils.py`, as used by
`/root/reference/unetr_segmentation_3d.py:109,143,694`):

  - symmetric pad of every spatial dim up to roi (half before),
  - dense start grid: step = int(roi*(1-overlap)) (= roi when dim == roi),
    starts k*step clipped to dim-roi,
  - per-window importance map (constant / peak-normalized gaussian with
    sigma = 0.125*roi, zeros clamped to the smallest positive value),
  - accumulate importance-weighted logits + importance count map,
  - divide, crop the padding.

The predictor is a REAL 3x3x3 conv (zero 'same' padding), so windowed and
whole-volume results differ at window borders — the fixture pins the exact
blend/grid behavior, which a voxelwise oracle cannot.

Run: python tests/golden/gen_swi_golden.py  (writes swi_golden.npz here)
"""
import math
import numpy as np
import torch
import torch.nn.functional as F

RNG = np.random.default_rng(42)


def dense_starts(image_size, roi, overlap):
    per_dim = []
    for dim, r in zip(image_size, roi):
        step = r if r == dim else max(1, int(r * (1.0 - overlap)))
        n = int(math.ceil((dim - r) / step)) + 1
        starts = np.minimum(np.arange(n) * step, dim - r)
        per_dim.append(np.unique(starts))
    return np.stack(np.meshgrid(*per_dim, indexing="ij"), -1).reshape(-1, 3)


def importance(roi, mode, sigma_scale=0.125):
    if mode == "constant":
        return np.ones(roi, np.float32)
    maps = []
    for r in roi:
        sigma = sigma_scale * r
        center = (r - 1) / 2.0
        x = np.arange(r, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    return np.maximum(w, np.min(w[w > 0])).astype(np.float32)


def torch_swi(vol_dhwc, weight, bias, roi, overlap, mode, sw_batch=3):
    """vol (D,H,W,C) fp32 -> blended (D,H,W,K) via the torch loop."""
    spatial = vol_dhwc.shape[:3]
    pads = []
    for dim, r in zip(spatial, roi):
        extra = max(r - dim, 0)
        pads.append((extra // 2, extra - extra // 2))
    vol = np.pad(vol_dhwc, pads + [(0, 0)])
    padded = vol.shape[:3]
    x = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1, C, D, H, W)
    w = torch.from_numpy(weight)
    b = torch.from_numpy(bias)
    starts = dense_starts(padded, roi, overlap)
    imp = torch.from_numpy(importance(roi, mode))
    k = weight.shape[0]
    acc = torch.zeros((1, k) + padded)
    cnt = torch.zeros((1, 1) + padded)
    with torch.no_grad():
        for i0 in range(0, len(starts), sw_batch):
            batch = starts[i0 : i0 + sw_batch]
            ws = torch.cat(
                [x[..., s[0]:s[0]+roi[0], s[1]:s[1]+roi[1], s[2]:s[2]+roi[2]] for s in batch], 0
            )
            logits = F.conv3d(ws, w, b, padding=1) * imp
            for j, s in enumerate(batch):
                sl = (..., slice(s[0], s[0]+roi[0]), slice(s[1], s[1]+roi[1]), slice(s[2], s[2]+roi[2]))
                acc[sl] += logits[j : j + 1]
                cnt[sl] += imp
    out = (acc / cnt)[0].permute(1, 2, 3, 0).numpy()  # (D, H, W, K)
    sl = tuple(slice(lo, lo + s) for (lo, hi), s in zip(pads, spatial))
    return out[sl]


def main():
    torch.manual_seed(0)
    cases = {}
    weight = RNG.normal(size=(3, 2, 3, 3, 3)).astype(np.float32)  # (K, C, 3,3,3)
    bias = RNG.normal(size=(3,)).astype(np.float32)
    cases["weight"] = weight
    cases["bias"] = bias
    configs = [
        ("a", (40, 36, 28), (16, 16, 16), 0.5, "gaussian"),
        ("b", (40, 36, 28), (16, 16, 16), 0.25, "constant"),
        ("c", (20, 36, 28), (16, 16, 16), 0.8, "gaussian"),   # overlay overlap
        ("d", (12, 10, 28), (16, 16, 16), 0.25, "gaussian"),  # vol < roi: padding
    ]
    for name, shape, roi, overlap, mode in configs:
        vol = RNG.normal(size=shape + (2,)).astype(np.float32)
        out = torch_swi(vol, weight, bias, roi, overlap, mode)
        cases[f"{name}_vol"] = vol
        cases[f"{name}_out"] = out
        cases[f"{name}_meta"] = np.array([*roi, overlap, {"constant": 0, "gaussian": 1}[mode]], np.float64)
    np.savez_compressed("tests/golden/swi_golden.npz", **cases)
    print("wrote tests/golden/swi_golden.npz:", {k: v.shape for k, v in cases.items()})


if __name__ == "__main__":
    main()
