"""DiceCE loss parity vs a direct torch implementation of the MONAI 0.6 contract.

Both reference configs are covered: CT ``DiceCELoss(to_onehot_y=True,
softmax=True)`` (`unetr_segmentation_3d.py:404`) and BraTS
``DiceCELoss(to_onehot_y=False, sigmoid=True)`` (`:480`).
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from medseg.ops.losses import dice_ce_loss, dice_loss, softmax_ce_with_label_indices


def torch_dice(probs: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
    """MONAI 0.6 DiceLoss body (NCDHW): smooth 1e-5, mean over batch+class."""
    dims = (2, 3, 4)
    inter = (probs * target).sum(dims)
    denom = target.sum(dims) + probs.sum(dims)
    return (1 - (2 * inter + 1e-5) / (denom + 1e-5)).mean()


def test_dice_ce_softmax_config(rng):
    b, k = 2, 4
    logits = rng.normal(size=(b, 5, 6, 7, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(b, 5, 6, 7)).astype(np.int32)

    lt = torch.tensor(logits).permute(0, 4, 1, 2, 3)  # NCDHW
    yt = torch.tensor(labels).long()
    onehot = F.one_hot(yt, k).permute(0, 4, 1, 2, 3).float()
    expected = torch_dice(torch.softmax(lt, 1), onehot) + F.cross_entropy(lt, yt)

    got = dice_ce_loss(
        jnp.asarray(logits), jnp.asarray(labels), softmax=True, to_onehot_y=True
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_dice_ce_sigmoid_config(rng):
    b, k = 2, 4
    logits = rng.normal(size=(b, 5, 6, 7, k)).astype(np.float32)
    target = (rng.random(size=(b, 5, 6, 7, k)) > 0.6).astype(np.float32)

    lt = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    tt = torch.tensor(target).permute(0, 4, 1, 2, 3)
    # MONAI 0.6 quirk: CE argmaxes a same-channel-count target to indices.
    expected = torch_dice(torch.sigmoid(lt), tt) + F.cross_entropy(
        lt, tt.argmax(dim=1)
    )

    got = dice_ce_loss(jnp.asarray(logits), jnp.asarray(target), sigmoid=True)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_dice_perfect_prediction_near_zero(rng):
    labels = rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32)
    onehot = np.eye(3, dtype=np.float32)[labels]
    logits = 50.0 * (2 * onehot - 1)  # saturated correct logits
    d = dice_loss(jnp.asarray(logits), jnp.asarray(labels), softmax=True, to_onehot_y=True)
    assert float(d) < 1e-3


def test_ce_matches_torch(rng):
    logits = rng.normal(size=(2, 4, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 4, 4, 4)).astype(np.int32)
    expected = F.cross_entropy(
        torch.tensor(logits).permute(0, 4, 1, 2, 3), torch.tensor(labels).long()
    )
    got = softmax_ce_with_label_indices(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-6)
