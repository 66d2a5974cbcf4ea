"""Flat-lane fused residual blocks (the TPU serving fast path).

A ``UnetResBlock`` (conv-norm-lrelu, conv-norm, +residual, lrelu — the
reference's building block at `/root/reference/unetr.py:90-98,165-174`)
executed end-to-end in the flat-lane layout of medseg/kernels/conv3d.py:
ONE NDHWC->flat conversion at block entry and one at exit, Pallas convs in
between, instance-norm statistics computed directly on masked flat lanes.
This is what makes the Pallas conv pay off — the per-conv layout round trip
costs more than the kernel saves (measured ~6.5ms per round trip at 8x96^3).

All functions are pure (consume the flax params subtree), fully jit-able, and
have exact XLA-equivalent semantics (parity-tested in tests/test_fast_unetr.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from medseg.kernels.conv3d import (
    _wp,
    conv3x3x3_flat,
    flat_supported,
    from_flat,
    to_flat,
    weight_matrix,
)
from medseg.models.blocks import LEAKY_SLOPE, NORM_EPS


def _valid_lane_mask(w: int, wp: int, lanes: int) -> np.ndarray:
    lane = np.arange(lanes) % wp
    return ((lane >= 1) & (lane < w + 1)).astype(np.float32)


def instance_norm_flat(
    xf: jax.Array,  # (B, D, C, H*WP) conv output (no halos), fp32
    scale: jax.Array,
    bias: jax.Array,
    w: int,
    eps: float = NORM_EPS,
) -> jax.Array:
    """Affine instance norm over the valid (z, y, x) voxels of a flat tensor."""
    b, d, c, lanes = xf.shape
    wp = _wp(w)
    mask = jnp.asarray(_valid_lane_mask(w, wp, lanes))
    n = d * (lanes // wp) * w  # number of valid voxels per (b, c)
    xm = xf * mask
    mean = jnp.sum(xm, axis=(1, 3), keepdims=True) / n
    var = jnp.sum(jnp.square((xf - mean) * mask), axis=(1, 3), keepdims=True) / n
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale[None, None, :, None] + bias[None, None, :, None]
    return y * mask  # keep pad lanes zero for downstream convs


def leaky_flat(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def repad_flat(xf: jax.Array, h: int, w: int, dtype) -> jax.Array:
    """Conv-output flat (B, D, C, H*WP) -> conv-input flat (B, D+2, C, (H+2)*WP).

    Re-adds the z and y halo rows (zeros); pad lanes are already zero.
    """
    b, d, c, lanes = xf.shape
    wp = _wp(w)
    x5 = xf.reshape(b, d, c, lanes // wp, wp).astype(dtype)
    x5 = jnp.pad(x5, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)))
    return x5.reshape(b, d + 2, c, (lanes // wp + 2) * wp)


def conv1x1_flat(xf: jax.Array, kernel1: jax.Array) -> jax.Array:
    """1x1x1 conv on a flat tensor: (B,D,C,L) x (C,CO) -> (B,D,CO,L) fp32."""
    return jnp.einsum(
        "bdcl,ck->bdkl", xf, kernel1, preferred_element_type=jnp.float32
    )


def _p(params: dict, *path):
    node = params
    for k in path:
        node = node[k]
    return node


def res_block_flat_core(
    params: dict,  # UnetResBlock subtree: conv1/conv2[/conv3], norm1/norm2[/norm3]
    xf_in: jax.Array,  # conv-INPUT-form flat (B, D+2, C, (H+2)*WP)
    *,
    h: int,
    w: int,
    features: int,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """UnetResBlock on a flat-layout input; returns conv-OUTPUT-form flat
    (B, D, features, H*WP) in ``dtype``. Requires C_in % 8 == 0."""
    b = xf_in.shape[0]
    d = xf_in.shape[1] - 2
    c = xf_in.shape[2]

    w1 = weight_matrix(_p(params, "conv1", "conv", "kernel"), dtype)
    y = conv3x3x3_flat(xf_in, w1, h=h, w=w, interpret=interpret)
    y = instance_norm_flat(
        y, _p(params, "norm1", "scale"), _p(params, "norm1", "bias"), w
    )
    y = leaky_flat(y)

    w2 = weight_matrix(_p(params, "conv2", "conv", "kernel"), dtype)
    y = conv3x3x3_flat(repad_flat(y, h, w, dtype), w2, h=h, w=w, interpret=interpret)
    y = instance_norm_flat(
        y, _p(params, "norm2", "scale"), _p(params, "norm2", "bias"), w
    )

    if "conv3" in params:  # projection residual (channel change)
        k3 = _p(params, "conv3", "conv", "kernel")[0, 0, 0].astype(dtype)  # (C, CO)
        r = conv1x1_flat(xf_in[:, 1:-1], k3)
        # drop the y-halo blocks from the residual's lane axis
        wp = _wp(w)
        r = r.reshape(b, d, features, h + 2, wp)[:, :, :, 1:-1].reshape(
            b, d, features, h * wp
        )
        r = instance_norm_flat(
            r, _p(params, "norm3", "scale"), _p(params, "norm3", "bias"), w
        )
    else:
        wp = _wp(w)
        r = (
            xf_in[:, 1:-1]
            .reshape(b, d, c, h + 2, wp)[:, :, :, 1:-1]
            .reshape(b, d, c, h * wp)
            .astype(jnp.float32)
        )
    return leaky_flat(y + r).astype(dtype)


def res_block_flat(
    params: dict,
    x: jax.Array,  # NDHWC
    *,
    features: int,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """UnetResBlock in flat layout, NDHWC in / NDHWC out."""
    b, d, h, w, c = x.shape
    out = res_block_flat_core(
        params,
        to_flat(x.astype(dtype)),
        h=h,
        w=w,
        features=features,
        dtype=dtype,
        interpret=interpret,
    )
    return from_flat(out.astype(jnp.float32), h, w).astype(dtype)


def res_block_flat_fusable(x_shape, features: int) -> bool:
    b, d, h, w, c = x_shape
    return (
        jax.default_backend() == "tpu"
        and flat_supported(x_shape, features)
        and flat_supported((b, d, h, w, features), features)
    )
