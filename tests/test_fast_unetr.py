"""Parity tests for the fused TPU serving forward (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.kernels.blocks_flat import instance_norm_flat, res_block_flat
from medseg.kernels.conv3d import to_flat, from_flat, _wp
from medseg.kernels.fast_unetr import fast_apply
from medseg.models.blocks import InstanceNorm, UnetResBlock
from medseg.models.unetr import UNETR

TOL = dict(rtol=2e-4, atol=2e-4)


def test_instance_norm_flat_matches_module(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 4, 8, 8, 16)).astype(np.float32))
    mod = InstanceNorm()
    scale = jnp.asarray(rng.normal(size=16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
    ref = mod.apply({"params": {"scale": scale, "bias": bias}}, x)

    # flat path: convert, norm, convert back
    xf = to_flat(x)[:, 1:-1]
    b, d, h, w, c = x.shape
    wp = _wp(w)
    xf = xf.reshape(b, d, c, h + 2, wp)[:, :, :, 1:-1].reshape(b, d, c, h * wp)
    yf = instance_norm_flat(xf, scale, bias, w)
    got = from_flat(yf, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


@pytest.mark.parametrize("cin", [16, 32])
def test_res_block_flat_matches_module(rng, cin):
    features = 16
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, cin)).astype(np.float32))
    mod = UnetResBlock(features=features)
    params = mod.init(jax.random.key(0), x)
    ref = mod.apply(params, x)
    got = res_block_flat(
        params["params"], x, features=features, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_fast_apply_matches_model(rng):
    model = UNETR(
        in_channels=1,
        out_channels=3,
        img_size=(32, 32, 32),
        feature_size=8,
        hidden_size=24,
        mlp_dim=48,
        num_heads=4,
        num_layers=4,
        patch_size=16,
    )
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    ref = model.apply(params, x, return_encoder_features=False)
    got = fast_apply(model, params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)
