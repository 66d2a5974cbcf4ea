"""Fused DiceCE kernel (kernels/loss_of.py) vs the jnp contract oracle
(ops/losses.dice_ce_loss, itself torch-oracle-tested in test_losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medseg.kernels.loss_of import dice_ce_fused, fused_loss_supported
from medseg.ops.losses import dice_ce_loss

B, D, H, W, C = 2, 8, 8, 16, 5  # H*W = 128 (compact), C pads to 8


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _data(rng, c=C):
    logits = jnp.asarray(
        4.0 * rng.normal(size=(B, D, H, W, c)).astype(np.float32)
    )
    label = jnp.asarray(rng.integers(0, c, size=(B, D, H, W)).astype(np.int32))
    return logits, label


def test_value_matches_jnp(rng):
    logits, label = _data(rng)
    want = dice_ce_loss(logits, label, softmax=True, to_onehot_y=True)
    got = dice_ce_fused(logits, label, interpret=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_value_trailing_channel_label(rng):
    logits, label = _data(rng)
    want = dice_ce_loss(logits, label[..., None], softmax=True, to_onehot_y=True)
    got = dice_ce_fused(logits, label[..., None], interpret=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_grad_matches_jnp(rng):
    logits, label = _data(rng)
    g_want = jax.grad(
        lambda lg: dice_ce_loss(lg, label, softmax=True, to_onehot_y=True)
    )(logits)
    g_got = jax.grad(lambda lg: dice_ce_fused(lg, label, interpret=True))(logits)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-7
    )


def test_grad_scaled_cotangent(rng):
    """A non-unit upstream cotangent must scale dlogits linearly (the VJP
    folds it into the coefficient rows)."""
    logits, label = _data(rng)
    g1 = jax.grad(lambda lg: dice_ce_fused(lg, label, interpret=True))(logits)
    g3 = jax.grad(lambda lg: 3.0 * dice_ce_fused(lg, label, interpret=True))(logits)
    # not bitwise (3*(a/x) vs (3a)/x fp rounding) — rtol + small-grad atol
    np.testing.assert_allclose(
        np.asarray(g3), 3.0 * np.asarray(g1), rtol=1e-4, atol=1e-9
    )


def test_grad_through_params_chain(rng):
    """grad flows through a computation producing the logits (the train-step
    usage) and matches the jnp loss end-to-end."""
    logits, label = _data(rng)
    wgt = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32))

    def f_fused(w):
        return dice_ce_fused(logits @ w, label, interpret=True)

    def f_jnp(w):
        return dice_ce_loss(logits @ w, label, softmax=True, to_onehot_y=True)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fused)(wgt)),
        np.asarray(jax.grad(f_jnp)(wgt)),
        rtol=1e-4, atol=1e-7,
    )


def test_supported_predicate():
    assert fused_loss_supported((4, 96, 96, 96, 14), "ct")
    assert not fused_loss_supported((4, 96, 96, 96, 14), "mri")
    assert not fused_loss_supported((4, 96, 90, 90, 14), "ct")  # 8100 % 128
    assert not fused_loss_supported((4, 96, 96, 96, 32), "ct")  # C > 16
