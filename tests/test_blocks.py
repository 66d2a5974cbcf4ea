"""Golden-parity tests for conv building blocks vs torch (CPU).

The reference's compute primitives are torch/cuDNN Conv3d, ConvTranspose3d and
InstanceNorm3d (via MONAI blocks, `/root/reference/unetr.py:90-175`). torch is
available on CPU in CI, so each primitive is checked numerically against the
torch op it must reproduce, with weights copied across layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from medseg.models.blocks import (
    Conv3d,
    ConvTranspose3d,
    InstanceNorm,
    UnetResBlock,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def to_jax_conv_kernel(w: torch.Tensor) -> np.ndarray:
    # torch conv weight (out, in, kd, kh, kw) -> flax (kd, kh, kw, in, out)
    return w.detach().numpy().transpose(2, 3, 4, 1, 0)


def to_jax_convt_kernel(w: torch.Tensor) -> np.ndarray:
    # torch convT weight (in, out, kd, kh, kw) -> flax transpose_kernel
    # layout (kd, kh, kw, out, in)
    return w.detach().numpy().transpose(2, 3, 4, 1, 0)


def ndhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 4, 1)


def test_conv3d_matches_torch(rng):
    x = torch.tensor(rng.normal(size=(2, 3, 8, 8, 8)).astype(np.float32))
    tconv = torch.nn.Conv3d(3, 5, kernel_size=3, padding=1)
    ref = tconv(x)

    mod = Conv3d(features=5, kernel_size=3)
    params = {
        "params": {
            "conv": {
                "kernel": to_jax_conv_kernel(tconv.weight),
                "bias": tconv.bias.detach().numpy(),
            }
        }
    }
    out = mod.apply(params, jnp.asarray(ndhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ndhwc(ref), **TOL)


def test_conv_transpose3d_matches_torch(rng):
    x = torch.tensor(rng.normal(size=(2, 4, 5, 6, 7)).astype(np.float32))
    tconv = torch.nn.ConvTranspose3d(4, 3, kernel_size=2, stride=2)
    ref = tconv(x)
    assert ref.shape == (2, 3, 10, 12, 14)

    mod = ConvTranspose3d(features=3)
    params = {
        "params": {
            "convt": {
                "kernel": to_jax_convt_kernel(tconv.weight),
                "bias": tconv.bias.detach().numpy(),
            }
        }
    }
    out = mod.apply(params, jnp.asarray(ndhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ndhwc(ref), **TOL)


def test_instance_norm_matches_torch(rng):
    x = torch.tensor(rng.normal(size=(2, 6, 5, 5, 5)).astype(np.float32))
    tnorm = torch.nn.InstanceNorm3d(6, affine=True, eps=1e-5)
    with torch.no_grad():
        tnorm.weight.copy_(torch.tensor(rng.normal(size=6).astype(np.float32)))
        tnorm.bias.copy_(torch.tensor(rng.normal(size=6).astype(np.float32)))
    ref = tnorm(x)

    mod = InstanceNorm()
    params = {
        "params": {
            "scale": tnorm.weight.detach().numpy(),
            "bias": tnorm.bias.detach().numpy(),
        }
    }
    out = mod.apply(params, jnp.asarray(ndhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ndhwc(ref), **TOL)


class TorchUnetResBlock(torch.nn.Module):
    """MONAI 0.6 UnetResBlock contract, built directly from torch primitives."""

    def __init__(self, in_ch, out_ch, k=3, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv3d(in_ch, out_ch, k, stride, padding=(k - 1) // 2)
        self.conv2 = torch.nn.Conv3d(out_ch, out_ch, k, 1, padding=(k - 1) // 2)
        self.norm1 = torch.nn.InstanceNorm3d(out_ch, affine=True)
        self.norm2 = torch.nn.InstanceNorm3d(out_ch, affine=True)
        self.act = torch.nn.LeakyReLU(0.01)
        self.downsample = in_ch != out_ch or stride != 1
        if self.downsample:
            self.conv3 = torch.nn.Conv3d(in_ch, out_ch, 1, stride)
            self.norm3 = torch.nn.InstanceNorm3d(out_ch, affine=True)

    def forward(self, x):
        residual = x
        out = self.act(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            residual = self.norm3(self.conv3(x))
        return self.act(out + residual)


def _conv_params(tconv):
    return {
        "conv": {
            "kernel": to_jax_conv_kernel(tconv.weight),
            "bias": tconv.bias.detach().numpy(),
        }
    }


def _norm_params(tnorm):
    return {
        "scale": tnorm.weight.detach().numpy(),
        "bias": tnorm.bias.detach().numpy(),
    }


@pytest.mark.parametrize("in_ch,out_ch", [(3, 8), (8, 8)])
def test_unet_res_block_matches_torch(rng, in_ch, out_ch):
    x = torch.tensor(rng.normal(size=(2, in_ch, 6, 6, 6)).astype(np.float32))
    tblk = TorchUnetResBlock(in_ch, out_ch)
    with torch.no_grad():
        for m in tblk.modules():
            if isinstance(m, torch.nn.InstanceNorm3d):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.rand_like(m.bias) - 0.5)
    ref = tblk(x)

    params = {
        "conv1": _conv_params(tblk.conv1),
        "conv2": _conv_params(tblk.conv2),
        "norm1": _norm_params(tblk.norm1),
        "norm2": _norm_params(tblk.norm2),
    }
    if tblk.downsample:
        params["conv3"] = _conv_params(tblk.conv3)
        params["norm3"] = _norm_params(tblk.norm3)

    mod = UnetResBlock(features=out_ch)
    out = mod.apply({"params": params}, jnp.asarray(ndhwc(x)))
    np.testing.assert_allclose(np.asarray(out), ndhwc(ref), **TOL)
