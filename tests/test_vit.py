"""Golden-parity tests for the ViT encoder vs torch-built contract modules.

The contract is MONAI 0.6 ``ViT`` (`/root/reference/unetr.py:78-89`): perceptron
patch embedding, pre-LN blocks with fused no-bias qkv, exact GELU MLP. Each
piece is rebuilt here in plain torch from the documented contract and compared
numerically against the JAX modules with copied weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from medseg.models.vit import MultiHeadSelfAttention, PatchEmbed3D, TransformerBlock, ViT3D

TOL = dict(rtol=5e-5, atol=5e-5)


def test_patch_embed_matches_einops_contract(rng):
    """Perceptron embedding: tokens = Linear(rearrange(x)), reference einops
    pattern 'b c (h x) (w y) (d z) -> b (h w d) (x y z c)' with p=2."""
    b, c, p = 2, 3, 2
    d = h = w = 4
    hidden = 8
    x_t = rng.normal(size=(b, c, d, h, w)).astype(np.float32)  # NCDHW
    wgt = rng.normal(size=(hidden, p * p * p * c)).astype(np.float32) * 0.1
    bias = rng.normal(size=(hidden,)).astype(np.float32)

    # torch-side reference: explicit loops over the einops pattern
    gd = d // p
    n = gd**3
    feats = np.zeros((b, n, p * p * p * c), dtype=np.float32)
    for bi in range(b):
        tok = 0
        for i in range(gd):
            for j in range(gd):
                for k in range(gd):
                    patch = x_t[
                        bi, :, i * p : (i + 1) * p, j * p : (j + 1) * p, k * p : (k + 1) * p
                    ]
                    # flatten (x, y, z, c): channel fastest
                    feats[bi, tok] = patch.transpose(1, 2, 3, 0).reshape(-1)
                    tok += 1
    expected = feats @ wgt.T + bias

    mod = PatchEmbed3D(hidden_size=hidden, patch_size=p)
    x_j = jnp.asarray(x_t.transpose(0, 2, 3, 4, 1))  # NDHWC
    params = mod.init(jax.random.key(0), x_j)
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["params"]["proj"]["kernel"] = jnp.asarray(wgt.T)
    params["params"]["proj"]["bias"] = jnp.asarray(bias)
    pos = np.asarray(params["params"]["pos_embedding"])
    out = mod.apply(params, x_j)
    np.testing.assert_allclose(np.asarray(out), expected + pos, **TOL)


class TorchSABlock(torch.nn.Module):
    """MONAI 0.6 SABlock contract: qkv Linear (no bias), out proj (bias)."""

    def __init__(self, hidden, heads):
        super().__init__()
        self.qkv = torch.nn.Linear(hidden, hidden * 3, bias=False)
        self.out_proj = torch.nn.Linear(hidden, hidden)
        self.heads = heads
        self.head_dim = hidden // heads
        self.scale = self.head_dim**-0.5

    def forward(self, x):
        b, n, h = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        att = torch.softmax(q @ k.transpose(-2, -1) * self.scale, dim=-1)
        y = (att @ v).permute(0, 2, 1, 3).reshape(b, n, h)
        return self.out_proj(y)


def test_attention_matches_torch(rng):
    hidden, heads = 24, 4
    x = torch.tensor(rng.normal(size=(2, 10, hidden)).astype(np.float32))
    tmod = TorchSABlock(hidden, heads)
    ref = tmod(x)

    jmod = MultiHeadSelfAttention(hidden_size=hidden, num_heads=heads)
    params = {
        "params": {
            "qkv": {"kernel": tmod.qkv.weight.detach().numpy().T},
            "out_proj": {
                "kernel": tmod.out_proj.weight.detach().numpy().T,
                "bias": tmod.out_proj.bias.detach().numpy(),
            },
        }
    }
    out = jmod.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


class TorchTransformerBlock(torch.nn.Module):
    def __init__(self, hidden, mlp_dim, heads):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(hidden)
        self.norm2 = torch.nn.LayerNorm(hidden)
        self.attn = TorchSABlock(hidden, heads)
        self.fc1 = torch.nn.Linear(hidden, mlp_dim)
        self.fc2 = torch.nn.Linear(mlp_dim, hidden)
        self.gelu = torch.nn.GELU()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.fc2(self.gelu(self.fc1(self.norm2(x))))
        return x


def test_transformer_block_matches_torch(rng):
    hidden, mlp_dim, heads = 24, 48, 4
    x = torch.tensor(rng.normal(size=(2, 10, hidden)).astype(np.float32))
    tmod = TorchTransformerBlock(hidden, mlp_dim, heads)
    ref = tmod(x)

    jmod = TransformerBlock(hidden_size=hidden, mlp_dim=mlp_dim, num_heads=heads)
    params = {
        "params": {
            "norm1": {
                "scale": tmod.norm1.weight.detach().numpy(),
                "bias": tmod.norm1.bias.detach().numpy(),
            },
            "norm2": {
                "scale": tmod.norm2.weight.detach().numpy(),
                "bias": tmod.norm2.bias.detach().numpy(),
            },
            "attn": {
                "qkv": {"kernel": tmod.attn.qkv.weight.detach().numpy().T},
                "out_proj": {
                    "kernel": tmod.attn.out_proj.weight.detach().numpy().T,
                    "bias": tmod.attn.out_proj.bias.detach().numpy(),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": tmod.fc1.weight.detach().numpy().T,
                    "bias": tmod.fc1.bias.detach().numpy(),
                },
                "fc2": {
                    "kernel": tmod.fc2.weight.detach().numpy().T,
                    "bias": tmod.fc2.bias.detach().numpy(),
                },
            },
        }
    }
    out = jmod.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), **TOL)


def test_vit_shapes_and_hidden_states(rng):
    mod = ViT3D(hidden_size=48, mlp_dim=96, num_layers=4, num_heads=4, patch_size=8)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    params = mod.init(jax.random.key(0), x)
    out, hidden = mod.apply(params, x)
    assert out.shape == (2, 8, 48)
    assert len(hidden) == 4
    assert all(h.shape == (2, 8, 48) for h in hidden)
    # final output is LayerNorm(last hidden), not the raw hidden
    assert not np.allclose(np.asarray(out), np.asarray(hidden[-1]))
