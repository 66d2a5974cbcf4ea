"""Measured reference baseline: torch UNETR-B/16 + MONAI-0.6-contract SWI.

The reference stack is MONAI ``sliding_window_inference`` (a Python loop over
window stacks) around ``monai.networks.nets.UNETR``
(`/root/reference/unetr_segmentation_3d.py:109,501-513,694`). MONAI itself is
not installable in this image, so this harness re-creates that exact path
from the documented MONAI 0.6 contracts (SURVEY.md §2.2):

- UNETR-B/16: perceptron patch embed, 12 pre-LN blocks (12 heads, MLP 3072),
  hidden-state taps at [3]/[6]/[9], transpose-conv encoders, residual
  conv-block decoders (`/root/reference/unetr.py:21-208`);
- SWI: dense window grid (interval = roi*(1-overlap), starts clipped to
  dim-roi), ``sw_batch`` windows per forward, importance-weighted accumulate,
  divide by count map (MONAI 0.6 ``sliding_window_inference``).

Run on this host's CPU (torch 2.13+cpu). The full 512x512x160 volume is 300
windows at 96^3/overlap 0.5; a full pass takes tens of minutes on CPU, so the
harness times K window-stacks after warmup and extrapolates linearly (SWI
cost is window-dominated; the blending adds < 1%% — measured and printed).

Usage: python benchmarks/baseline_torch.py [--stacks 3] [--threads N]
Output: one JSON line with windows/sec, extrapolated volumes/sec, and the
measurement parameters. See docs/BASELINE_MEASUREMENT.md for how this feeds
the A100 denominator used by bench.py.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np
import torch
import torch.nn as nn

# Flagship config: BASELINE.json config 4 / `unetr_segmentation_3d.py:501-513`
HID, MLP, HEADS, LAYERS, FS, PATCH = 768, 3072, 12, 12, 16, 16
IN_CH, OUT_CH, ROI = 1, 14, 96
VOLUME_SHAPE = (512, 512, 160)
OVERLAP = 0.5
SW_BATCH = 8  # same as bench.py


class SABlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(HID, HID * 3, bias=False)
        self.out_proj = nn.Linear(HID, HID)

    def forward(self, x):
        b, n, _ = x.shape
        hd = HID // HEADS
        qkv = self.qkv(x).reshape(b, n, 3, HEADS, hd)
        q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
        att = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        return self.out_proj((att @ v).permute(0, 2, 1, 3).reshape(b, n, HID))


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1, self.norm2 = nn.LayerNorm(HID), nn.LayerNorm(HID)
        self.attn = SABlock()
        self.fc1, self.fc2 = nn.Linear(HID, MLP), nn.Linear(MLP, HID)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))


class ViT(nn.Module):
    def __init__(self):
        super().__init__()
        n = (ROI // PATCH) ** 3
        self.embed = nn.Linear(PATCH**3 * IN_CH, HID)
        self.pos = nn.Parameter(torch.zeros(1, n, HID))
        self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
        self.norm = nn.LayerNorm(HID)

    def forward(self, x):  # NCDHW
        b, c, d, h, w = x.shape
        g = d // PATCH
        x = x.reshape(b, c, g, PATCH, g, PATCH, g, PATCH)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(b, g**3, -1)
        x = self.embed(x) + self.pos
        hidden = []
        for blk in self.blocks:
            x = blk(x)
            hidden.append(x)
        return self.norm(x), hidden


class ResBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1 = nn.Conv3d(i, o, 3, 1, 1, bias=False)
        self.conv2 = nn.Conv3d(o, o, 3, 1, 1, bias=False)
        self.norm1 = nn.InstanceNorm3d(o, affine=True)
        self.norm2 = nn.InstanceNorm3d(o, affine=True)
        self.act = nn.LeakyReLU(0.01)
        self.down = i != o
        if self.down:
            self.conv3 = nn.Conv3d(i, o, 1, bias=False)
            self.norm3 = nn.InstanceNorm3d(o, affine=True)

    def forward(self, x):
        r = self.norm3(self.conv3(x)) if self.down else x
        y = self.act(self.norm1(self.conv1(x)))
        y = self.norm2(self.conv2(y))
        return self.act(y + r)


class PrUp(nn.Module):
    def __init__(self, o, num_layer):
        super().__init__()
        chain = [nn.ConvTranspose3d(HID, o, 2, 2, bias=False)]
        chain += [nn.ConvTranspose3d(o, o, 2, 2, bias=False) for _ in range(num_layer)]
        self.chain = nn.ModuleList(chain)

    def forward(self, x):
        for c in self.chain:
            x = c(x)
        return x


class Up(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.transp = nn.ConvTranspose3d(i, o, 2, 2, bias=False)
        self.block = ResBlock(2 * o, o)

    def forward(self, x, skip):
        return self.block(torch.cat([self.transp(x), skip], dim=1))


class TorchUNETR(nn.Module):
    def __init__(self):
        super().__init__()
        self.vit = ViT()
        self.encoder1 = ResBlock(IN_CH, FS)
        self.encoder2 = PrUp(FS * 2, 2)
        self.encoder3 = PrUp(FS * 4, 1)
        self.encoder4 = PrUp(FS * 8, 0)
        self.decoder5 = Up(HID, FS * 8)
        self.decoder4 = Up(FS * 8, FS * 4)
        self.decoder3 = Up(FS * 4, FS * 2)
        self.decoder2 = Up(FS * 2, FS)
        self.out = nn.Conv3d(FS, OUT_CH, 1)

    def proj(self, t):
        g = ROI // PATCH
        return t.view(t.shape[0], g, g, g, HID).permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x):
        tok, hid = self.vit(x)
        enc1 = self.encoder1(x)
        enc2 = self.encoder2(self.proj(hid[3]))
        enc3 = self.encoder3(self.proj(hid[6]))
        enc4 = self.encoder4(self.proj(hid[9]))
        d = self.decoder5(self.proj(tok), enc4)
        d = self.decoder4(d, enc3)
        d = self.decoder3(d, enc2)
        d = self.decoder2(d, enc1)
        return self.out(d)


def dense_starts(image_size, roi, overlap):
    """MONAI 0.6 ``dense_patch_slices`` start grid (matches
    medseg/ops/sliding_window.py:compute_window_starts)."""
    per_dim = []
    for dim, r in zip(image_size, (roi,) * 3):
        step = r if r == dim else max(1, int(r * (1.0 - overlap)))
        n = int(math.ceil((dim - r) / step)) + 1
        starts = np.minimum(np.arange(n) * step, dim - r)
        per_dim.append(np.unique(starts))
    return np.stack(np.meshgrid(*per_dim, indexing="ij"), -1).reshape(-1, 3)


def gaussian_importance(roi, sigma_scale=0.125):
    maps = []
    for r in (roi,) * 3:
        sigma = sigma_scale * r
        center = (r - 1) / 2.0
        x = np.arange(r, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    w = w / w.max()
    return np.maximum(w, np.min(w[w > 0])).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stacks", type=int, default=2, help="timed window stacks")
    ap.add_argument("--threads", type=int, default=0, help="torch CPU threads (0=default)")
    ap.add_argument("--full", action="store_true", help="run the FULL volume (slow)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    torch.manual_seed(0)
    model = TorchUNETR().eval()
    starts = dense_starts(VOLUME_SHAPE, ROI, OVERLAP)
    n_windows = len(starts)
    imp = torch.from_numpy(gaussian_importance(ROI))
    vol = torch.from_numpy(
        (0.3 + 0.2 * np.random.default_rng(0).standard_normal(VOLUME_SHAPE))
        .astype(np.float32)[None, None]
    )

    def stack_windows(idx):
        ws = []
        for s in starts[idx : idx + SW_BATCH]:
            ws.append(vol[..., s[0] : s[0] + ROI, s[1] : s[1] + ROI, s[2] : s[2] + ROI])
        return torch.cat(ws, dim=0)

    with torch.no_grad():
        # warmup (allocators, thread pools, first conv algo selection)
        model(stack_windows(0)[:2])

        if args.full:
            acc = torch.zeros((1, OUT_CH) + VOLUME_SHAPE)
            cnt = torch.zeros((1, 1) + VOLUME_SHAPE)
            t0 = time.perf_counter()
            for i in range(0, n_windows, SW_BATCH):
                logits = model(stack_windows(i)) * imp
                for j, s in enumerate(starts[i : i + SW_BATCH]):
                    sl = (..., slice(s[0], s[0] + ROI), slice(s[1], s[1] + ROI), slice(s[2], s[2] + ROI))
                    acc[sl] += logits[j : j + 1]
                    cnt[sl] += imp
            acc /= cnt
            full_t = time.perf_counter() - t0
            per_volume = full_t
            win_per_sec = n_windows / full_t
        else:
            # timed stacks (model fwd + weighting + scatter-accumulate into a
            # full-size buffer, i.e. the real per-stack work of MONAI's loop)
            acc = torch.zeros((1, OUT_CH) + VOLUME_SHAPE)
            cnt = torch.zeros((1, 1) + VOLUME_SHAPE)
            t0 = time.perf_counter()
            timed_windows = 0
            for i in range(0, args.stacks * SW_BATCH, SW_BATCH):
                logits = model(stack_windows(i)) * imp
                for j, s in enumerate(starts[i : i + SW_BATCH]):
                    sl = (..., slice(s[0], s[0] + ROI), slice(s[1], s[1] + ROI), slice(s[2], s[2] + ROI))
                    acc[sl] += logits[j : j + 1]
                    cnt[sl] += imp
                timed_windows += SW_BATCH
            dt = time.perf_counter() - t0
            win_per_sec = timed_windows / dt
            # final normalization pass, amortized once per volume
            t1 = time.perf_counter()
            _ = acc / torch.clamp(cnt, min=1e-8)
            norm_t = time.perf_counter() - t1
            per_volume = n_windows / win_per_sec + norm_t

    print(
        json.dumps(
            {
                "harness": "torch_monai_contract_swi",
                "device": "cpu",
                "torch": torch.__version__,
                "threads": torch.get_num_threads(),
                "n_windows": int(n_windows),
                "windows_per_sec": round(win_per_sec, 4),
                "volumes_per_sec": round(1.0 / per_volume, 6),
                "seconds_per_volume": round(per_volume, 2),
                "extrapolated": not args.full,
            }
        )
    )


if __name__ == "__main__":
    main()
