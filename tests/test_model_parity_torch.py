"""END-TO-END model parity: full UNETR forward vs a torch implementation of
the reference contract, with weights converted through the checkpoint
converter.

This is BASELINE.json config 1 ("UNETR-base forward on a synthetic volume,
CPU-runnable ref") at CI-friendly size: the torch model below is built
independently from the documented MONAI 0.6 contracts
(`/root/reference/unetr.py:21-208` topology; block semantics per
medseg/models/blocks.py docstrings), its state_dict is converted by
`convert_torch_state_dict`, and the JAX forward must match within float
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from medseg.engine.checkpoint import convert_torch_state_dict, merge_params
from medseg.models.unetr import UNETR

HID, MLP, HEADS, LAYERS, FS, PATCH = 24, 48, 4, 4, 8, 16
CROP, IN_CH, OUT_CH = 32, 1, 3
TOL = dict(rtol=5e-4, atol=5e-4)


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
        self.mlp = nn.ModuleDict(
            {"linear1": nn.Linear(HID, MLP), "linear2": nn.Linear(MLP, HID)}
        )

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp["linear2"](torch.nn.functional.gelu(self.mlp["linear1"](self.norm2(x))))
        return x + h


class PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        n = (CROP // PATCH) ** 3
        self.patch_embeddings = nn.ModuleList([nn.Identity(), nn.Linear(PATCH**3 * IN_CH, HID)])
        self.position_embeddings = nn.Parameter(torch.zeros(1, n, HID))

    def forward(self, x):  # x NCDHW
        b, c, d, h, w = x.shape
        g = d // PATCH
        x = x.reshape(b, c, g, PATCH, g, PATCH, g, PATCH)
        # einops 'b c (h x) (w y) (d z) -> b (h w d) (x y z c)'
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(b, g**3, -1)
        return self.patch_embeddings[1](x) + self.position_embeddings


class ViT(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embedding = PatchEmbed()
        self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
        self.norm = nn.LayerNorm(HID)

    def forward(self, x):
        x = self.patch_embedding(x)
        hidden = []
        for blk in self.blocks:
            x = blk(x)
            hidden.append(x)
        return self.norm(x), hidden


def conv(i, o, k=3, s=1):
    return nn.ModuleDict({"conv": nn.Conv3d(i, o, k, s, (k - 1) // 2, bias=False)})


def convt(i, o):
    return nn.ModuleDict({"conv": nn.ConvTranspose3d(i, o, 2, 2, bias=False)})


class ResBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1, self.conv2 = conv(i, o), conv(o, o)
        self.norm1, self.norm2 = nn.InstanceNorm3d(o, affine=True), nn.InstanceNorm3d(o, affine=True)
        self.act = nn.LeakyReLU(0.01)
        self.down = i != o
        if self.down:
            self.conv3 = conv(i, o, 1)
            self.norm3 = nn.InstanceNorm3d(o, affine=True)

    def forward(self, x):
        r = self.norm3(self.conv3["conv"](x)) if self.down else x
        y = self.act(self.norm1(self.conv1["conv"](x)))
        y = self.norm2(self.conv2["conv"](y))
        return self.act(y + r)


class PrUp(nn.Module):
    def __init__(self, o, num_layer):
        super().__init__()
        self.transp_conv_init = convt(HID, o)
        self.blocks = nn.ModuleList([convt(o, o) for _ in range(num_layer)])

    def forward(self, x):
        x = self.transp_conv_init["conv"](x)
        for b in self.blocks:
            x = b["conv"](x)
        return x


class Up(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.transp_conv = convt(i, o)
        self.conv_block = ResBlock(2 * o, o)

    def forward(self, x, skip):
        return self.conv_block(torch.cat([self.transp_conv["conv"](x), skip], dim=1))


class TorchUNETR(nn.Module):
    """Reference UNETR topology (`/root/reference/unetr.py:182-208` contract),
    assembled from contract-built torch blocks."""

    def __init__(self):
        super().__init__()
        self.vit = ViT()
        self.encoder1 = nn.ModuleDict({"layer": ResBlock(IN_CH, FS)})
        self.encoder2 = PrUp(FS * 2, 2)
        self.encoder3 = PrUp(FS * 4, 1)
        self.encoder4 = PrUp(FS * 8, 0)
        self.decoder5 = Up(HID, FS * 8)
        self.decoder4 = Up(FS * 8, FS * 4)
        self.decoder3 = Up(FS * 4, FS * 2)
        self.decoder2 = Up(FS * 2, FS)
        self.out = nn.ModuleDict({"conv": nn.ModuleDict({"conv": nn.Conv3d(FS, OUT_CH, 1)})})

    def proj(self, t):
        g = CROP // PATCH
        b = t.shape[0]
        return t.view(b, g, g, g, HID).permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x):
        tok, hid = self.vit(x)
        q = LAYERS // 4
        enc1 = self.encoder1["layer"](x)
        enc2 = self.encoder2(self.proj(hid[q]))
        enc3 = self.encoder3(self.proj(hid[2 * q]))
        enc4 = self.encoder4(self.proj(hid[3 * q]))
        d = self.decoder5(self.proj(tok), enc4)
        d = self.decoder4(d, enc3)
        d = self.decoder3(d, enc2)
        d = self.decoder2(d, enc1)
        return self.out["conv"]["conv"](d)


def test_full_model_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchUNETR().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.5).add_(torch.randn_like(p) * 0.02)

    x = rng.normal(size=(1, IN_CH, CROP, CROP, CROP)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()  # NCDHW

    jmodel = UNETR(
        in_channels=IN_CH,
        out_channels=OUT_CH,
        img_size=(CROP,) * 3,
        feature_size=FS,
        hidden_size=HID,
        mlp_dim=MLP,
        num_heads=HEADS,
        num_layers=LAYERS,
        patch_size=PATCH,
    )
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NDHWC
    template = jmodel.init(jax.random.key(0), xj)
    converted = convert_torch_state_dict(tmodel.state_dict())
    params = merge_params(template, converted)
    logits = jmodel.apply(params, xj, return_encoder_features=False)
    got = np.asarray(logits).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref, **TOL)
