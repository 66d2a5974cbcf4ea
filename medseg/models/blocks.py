"""UNETR convolutional building blocks, TPU-native (NDHWC, flax.linen).

Behavior contracts come from the MONAI 0.6.0 blocks used by the reference
(`/root/reference/unetr.py:16-18` imports `UnetOutBlock`, `UnetrBasicBlock`,
`UnetrPrUpBlock`, `UnetrUpBlock`):

- ``UnetResBlock``: conv3x3x3 -> InstanceNorm -> LeakyReLU(0.01) ->
  conv3x3x3 -> InstanceNorm, plus a residual branch (1x1x1 conv + norm when
  the channel count changes), final LeakyReLU. This is what
  ``UnetrBasicBlock(res_block=True)`` resolves to — the configuration the
  reference always uses (`/root/reference/unetr_segmentation_3d.py:511`,
  `/root/reference/unetr_ranking_pretraining_3d.py:460`).
- ``UnetrPrUpBlock(conv_block=False)``: one ConvTranspose(k=2,s=2) from
  ``in_ch -> out_ch`` followed by ``num_layer`` more ConvTranspose(k=2,s=2)
  ``out_ch -> out_ch`` (reference constructs it this way at
  `/root/reference/unetr.py:99-134` — transpose convs only).
- ``UnetrUpBlock``: ConvTranspose(k=2,s=2) upsample, channel-concat with the
  skip, then a ``UnetResBlock`` (`/root/reference/unetr.py:135-174`).
- ``UnetOutBlock``: 1x1x1 conv with bias, no norm/activation
  (`/root/reference/unetr.py:175`).

All tensors are channels-last ``(B, D, H, W, C)`` — the natural layout for
XLA:TPU convolutions (lanes = channels).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

LEAKY_SLOPE = 0.01  # MONAI dynunet act: leakyrelu(negative_slope=0.01)
NORM_EPS = 1e-5  # torch InstanceNorm3d default eps


def leaky_relu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class InstanceNorm(nn.Module):
    """Affine instance norm over spatial dims, per-sample per-channel.

    Matches ``torch.nn.InstanceNorm3d(C, affine=True)`` as instantiated by
    MONAI's ``get_norm_layer(..., "instance")`` (affine=True, eps=1e-5,
    no running stats). Input is NDHWC; statistics are computed over the
    spatial axes only. With ``of=True`` the input is compact of-form
    (B, D + 2*DPAD, C, H*W): stats come from the sliced valid rows (so the
    DPAD guard rows carry zero cotangent), the affine applies to all rows.
    """

    epsilon: float = NORM_EPS
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, of: bool = False) -> jax.Array:
        c = x.shape[2] if of else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # Statistics in fp32 for stability even when activations are bf16.
        xf = x.astype(jnp.float32)
        if of:
            from medseg.kernels.conv_of import DPAD

            valid = xf[:, DPAD : x.shape[1] - DPAD]
            mean = jnp.mean(valid, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(valid - mean), axis=(1, 3), keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            y = y * scale[:, None] + bias[:, None]
            return y.astype(x.dtype)
        spatial_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=spatial_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class _FastConv3(nn.Module):
    """3x3x3 stride-1 conv routed through the Pallas flat-lane kernel on TPU
    (medseg/kernels/conv3d.py) with an exact XLA fallback elsewhere. Parameter
    names/shapes identical to ``nn.Conv`` so checkpoints are interchangeable.

    With ``ofhw=(h, w)`` the input is compact of-form (B, D + 2*DPAD, C, H*W)
    and the output stays in of-form — the block-level training fast path
    (``conv3x3x3_ofio``): no NDHWC<->of relayouts around the conv.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, ofhw: tuple[int, int] | None = None) -> jax.Array:
        from medseg.kernels.conv3d import conv3x3x3, conv3x3x3_ofio

        in_ch = x.shape[2] if ofhw is not None else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if ofhw is not None:
            h, w = ofhw
            y = conv3x3x3_ofio(x.astype(dtype), kernel.astype(dtype), h, w)
        else:
            y = conv3x3x3(x.astype(dtype), kernel.astype(dtype)).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if ofhw is not None:
                y = y + bias.astype(dtype)[:, None]
            else:
                y = y + bias.astype(dtype)
        return y


class _FastConv1(nn.Module):
    """1x1x1 conv on a compact of-form tensor (B, D + 2*DPAD, C, H*W): one
    channel matmul over sublanes. Parameter names/shapes identical to
    ``nn.Conv(features, (1, 1, 1))`` so checkpoints are interchangeable."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x_of: jax.Array) -> jax.Array:
        in_ch = x_of.shape[2]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x_of.dtype
        w = kernel.reshape(in_ch, self.features).astype(dtype)
        y = jnp.einsum(
            "co,bzcl->bzol", w, x_of.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)[:, None]
        return y


class Conv3d(nn.Module):
    """3D convolution, NDHWC, torch-compatible 'same' padding for odd kernels."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, ofhw: tuple[int, int] | None = None) -> jax.Array:
        k = self.kernel_size
        if ofhw is not None:
            assert self.stride == 1, "of-form path is stride-1 only"
            if k == 1:
                return _FastConv1(
                    features=self.features,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    name="conv",
                )(x)
            assert k == 3
            return _FastConv3(
                features=self.features,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x, ofhw=ofhw)
        if k == 3 and self.stride == 1:
            return _FastConv3(
                features=self.features,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        pad = (k - 1) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k, k),
            strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose3d(nn.Module):
    """ConvTranspose(k=2, s=2) used for all UNETR upsampling (doubles D/H/W)."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        # NOTE: an einsum + depth-to-space formulation of k2s2 conv-transpose
        # was measured on v5e and did NOT beat XLA's lowering at any stage
        # (docs/PERF_NOTES.md); keeping the plain op.
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(k, k, k),
            strides=(self.stride,) * 3,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            transpose_kernel=True,  # torch ConvTranspose semantics (flipped kernel)
            name="convt",
        )(x)


def _of_block_route(x: jax.Array, features: int, kernel_size: int, stride: int) -> bool:
    """Route a whole conv block through the of-form layout (one NDHWC<->of
    relayout per block instead of per conv — the per-conv round trips cost
    ~47 ms of the 148 ms train step at 4x96^3, benchmarks/trace_train.py).
    Same kernels as the per-conv ``conv3x3x3`` routing, so the same shape
    predicate applies to both convs of the block."""
    from medseg.kernels import conv3d

    if kernel_size != 3 or stride != 1 or not conv3d.train_of_active():
        return False
    b, d, h, w, _ = x.shape
    return conv3d._of_ok(x.shape, features) and conv3d._of_ok(
        (b, d, h, w, features), features
    )


class UnetResBlock(nn.Module):
    """Residual conv block: (conv-norm-lrelu, conv-norm) + projected residual."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        if _of_block_route(x, self.features, self.kernel_size, self.stride):
            from medseg.kernels import conv_of

            _, _, h, w, _ = x.shape
            dtype = self.dtype or x.dtype
            x_of = conv_of.to_output_form(x.astype(dtype))
            y = Conv3d(self.features, 3, 1, dtype=self.dtype, name="conv1")(x_of, ofhw=(h, w))
            y = InstanceNorm(dtype=self.dtype, name="norm1")(y, of=True)
            y = leaky_relu(y)
            y = Conv3d(self.features, 3, 1, dtype=self.dtype, name="conv2")(y, ofhw=(h, w))
            y = InstanceNorm(dtype=self.dtype, name="norm2")(y, of=True)
            if in_ch != self.features:
                r = Conv3d(self.features, 1, 1, dtype=self.dtype, name="conv3")(x_of, ofhw=(h, w))
                r = InstanceNorm(dtype=self.dtype, name="norm3")(r, of=True)
            else:
                r = x_of
            y = leaky_relu(y + r)
            return conv_of.from_output_form(y, h, w).astype(x.dtype)
        y = Conv3d(self.features, self.kernel_size, self.stride, dtype=self.dtype, name="conv1")(x)
        y = InstanceNorm(dtype=self.dtype, name="norm1")(y)
        y = leaky_relu(y)
        y = Conv3d(self.features, self.kernel_size, 1, dtype=self.dtype, name="conv2")(y)
        y = InstanceNorm(dtype=self.dtype, name="norm2")(y)
        if in_ch != self.features or self.stride != 1:
            r = Conv3d(self.features, 1, self.stride, dtype=self.dtype, name="conv3")(x)
            r = InstanceNorm(dtype=self.dtype, name="norm3")(r)
        else:
            r = x
        return leaky_relu(y + r)


class UnetBasicBlock(nn.Module):
    """Non-residual variant: (conv-norm-lrelu) x2 (res_block=False path)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if _of_block_route(x, self.features, self.kernel_size, self.stride):
            from medseg.kernels import conv_of

            _, _, h, w, _ = x.shape
            dtype = self.dtype or x.dtype
            x_of = conv_of.to_output_form(x.astype(dtype))
            y = Conv3d(self.features, 3, 1, dtype=self.dtype, name="conv1")(x_of, ofhw=(h, w))
            y = InstanceNorm(dtype=self.dtype, name="norm1")(y, of=True)
            y = leaky_relu(y)
            y = Conv3d(self.features, 3, 1, dtype=self.dtype, name="conv2")(y, ofhw=(h, w))
            y = InstanceNorm(dtype=self.dtype, name="norm2")(y, of=True)
            y = leaky_relu(y)
            return conv_of.from_output_form(y, h, w).astype(x.dtype)
        y = Conv3d(self.features, self.kernel_size, self.stride, dtype=self.dtype, name="conv1")(x)
        y = InstanceNorm(dtype=self.dtype, name="norm1")(y)
        y = leaky_relu(y)
        y = Conv3d(self.features, self.kernel_size, 1, dtype=self.dtype, name="conv2")(y)
        y = InstanceNorm(dtype=self.dtype, name="norm2")(y)
        return leaky_relu(y)


class UnetrBasicBlock(nn.Module):
    """Reference encoder1 (`/root/reference/unetr.py:90-98`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    res_block: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        blk = UnetResBlock if self.res_block else UnetBasicBlock
        return blk(self.features, self.kernel_size, self.stride, dtype=self.dtype, name="layer")(x)


class UnetrPrUpBlock(nn.Module):
    """Progressive upsampler from the token grid (`/root/reference/unetr.py:99-134`).

    ``num_layer + 1`` ConvTranspose(k=2,s=2) stages total; the reference uses
    ``conv_block=False`` so there are no conv blocks between stages.
    """

    features: int
    num_layer: int
    conv_block: bool = False
    res_block: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = ConvTranspose3d(self.features, dtype=self.dtype, name="transp_conv_init")(x)
        for i in range(self.num_layer):
            y = ConvTranspose3d(self.features, dtype=self.dtype, name=f"transp_{i}")(y)
            if self.conv_block:
                blk = UnetResBlock if self.res_block else UnetBasicBlock
                y = blk(self.features, dtype=self.dtype, name=f"block_{i}")(y)
        return y


class UnetrUpBlock(nn.Module):
    """Decoder stage: upsample, concat skip, residual conv block
    (`/root/reference/unetr.py:135-174`)."""

    features: int
    kernel_size: int = 3
    res_block: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        y = ConvTranspose3d(self.features, dtype=self.dtype, name="transp_conv")(x)
        y = jnp.concatenate([y, skip], axis=-1)
        blk = UnetResBlock if self.res_block else UnetBasicBlock
        return blk(self.features, self.kernel_size, 1, dtype=self.dtype, name="conv_block")(y)


class UnetOutBlock(nn.Module):
    """1x1x1 conv to class logits (`/root/reference/unetr.py:175`)."""

    n_classes: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            features=self.n_classes,
            kernel_size=(1, 1, 1),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
