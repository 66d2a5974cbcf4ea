"""UNETR assembly tests: shapes, encoder outputs, freeze_encoder semantics.

Contract: `/root/reference/unetr.py:182-208` — forward returns
``(enc4, logits)`` with enc4 at 1/8 resolution and 8x feature channels;
``freeze_encoder=True`` blocks gradient flow into the ViT and encoder taps
(reference wraps them in ``torch.no_grad()``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from medseg.models.unetr import UNETR


def tiny_unetr(**kw):
    cfg = dict(
        in_channels=1,
        out_channels=3,
        img_size=(32, 32, 32),
        feature_size=4,
        hidden_size=24,
        mlp_dim=48,
        num_heads=4,
        num_layers=12,
        patch_size=16,
        res_block=True,
    )
    cfg.update(kw)
    return UNETR(**cfg)


def test_forward_shapes(rng):
    model = tiny_unetr()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    enc4, logits = model.apply(params, x)
    assert logits.shape == (2, 32, 32, 32, 3)
    # enc4: 1/8 resolution, feature_size*8 channels (reference unetr.py:123-134)
    assert enc4.shape == (2, 4, 4, 4, 32)


def test_logits_only_variant(rng):
    """Stock MONAI UNETR returns logits only (unetr_segmentation_3d.py:501-513)."""
    model = tiny_unetr()
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x, return_encoder_features=False)
    _, logits2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_freeze_encoder_stops_gradients(rng):
    model = tiny_unetr()
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    def loss_fn(p, freeze):
        _, logits = model.apply(p, x, freeze_encoder=freeze)
        return jnp.sum(logits**2)

    grads_frozen = jax.grad(loss_fn)(params, True)
    grads_open = jax.grad(loss_fn)(params, False)

    def total_norm(tree):
        return sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(tree)
        )

    # encoder-side grads vanish when frozen, decoder grads survive
    assert total_norm(grads_frozen["params"]["vit"]) == 0.0
    assert total_norm(grads_frozen["params"]["encoder1"]) == 0.0
    assert total_norm(grads_frozen["params"]["encoder4"]) == 0.0
    assert total_norm(grads_frozen["params"]["decoder5"]) > 0.0
    assert total_norm(grads_frozen["params"]["out"]) > 0.0
    assert total_norm(grads_open["params"]["vit"]) > 0.0


def test_forward_deterministic(rng):
    model = tiny_unetr()
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    _, l1 = model.apply(params, x)
    _, l2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_bf16_compute_close_to_fp32(rng):
    model_fp32 = tiny_unetr()
    model_bf16 = tiny_unetr(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model_fp32.init(jax.random.key(0), x)
    _, l32 = model_fp32.apply(params, x)
    _, l16 = model_bf16.apply(params, x)
    # params stay fp32 masters; bf16 is compute dtype only
    assert l16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(l32), np.asarray(l16, dtype=np.float32), rtol=0.1, atol=0.1
    )


def test_ctor_enum_validation():
    """Reference ctor surface (`/root/reference/unetr.py:60-67`): bad
    pos_embed -> KeyError (same class as the reference), bad norm -> loud
    ValueError (the reference forwards it; our kernels only do instance)."""
    import pytest

    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    with pytest.raises(KeyError, match="not supported"):
        tiny_unetr(pos_embed="bogus").init(jax.random.key(0), x)
    with pytest.raises(ValueError, match="norm_name"):
        tiny_unetr(norm_name="batch").init(jax.random.key(0), x)


def test_pos_embed_conv(rng):
    """pos_embed="conv" (`/root/reference/unetr.py:66-67`): Conv3d patch
    embedding with k=stride=patch, same token order as the perceptron."""
    model = tiny_unetr(pos_embed="conv")
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    pe = params["params"]["vit"]["patch_embedding"]
    assert "proj_conv" in pe and pe["proj_conv"]["kernel"].shape == (16, 16, 16, 1, 24)
    enc4, logits = model.apply(params, x)
    assert logits.shape == (1, 32, 32, 32, 3)
    assert bool(jnp.isfinite(logits).all())

    # the conv embed IS a (p^3*C -> hidden) linear over each patch: check
    # token parity against the explicit gather+matmul
    k = pe["proj_conv"]["kernel"]
    b = pe["proj_conv"]["bias"]
    patches = x.reshape(1, 2, 16, 2, 16, 2, 16, 1).transpose(0, 1, 3, 5, 2, 4, 6, 7)
    tok = jnp.einsum("bnmlxyzc,xyzch->bnmlh", patches, k).reshape(1, 8, 24) + b
    pos = pe["pos_embedding"]
    from medseg.models.vit import PatchEmbed3D

    emb = PatchEmbed3D(hidden_size=24, patch_size=16, pos_embed="conv").apply(
        {"params": pe}, x
    )
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(tok + pos), rtol=1e-5, atol=1e-5
    )


def test_torch_converter_conv_pos_embed():
    """Converter maps MONAI's conv patch embedding (bare Conv3d under
    ``patch_embeddings``) onto ``proj_conv``."""
    from medseg.engine.checkpoint import convert_torch_state_dict

    sd = {
        "vit.patch_embedding.patch_embeddings.weight": np.zeros((24, 1, 16, 16, 16), np.float32),
        "vit.patch_embedding.patch_embeddings.bias": np.zeros((24,), np.float32),
    }
    tree = convert_torch_state_dict(sd)
    pc = tree["params"]["vit"]["patch_embedding"]["proj_conv"]
    assert pc["kernel"].shape == (16, 16, 16, 1, 24)
    assert pc["bias"].shape == (24,)
