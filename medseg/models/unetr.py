"""UNETR: ViT-encoded 3D U-Net for volumetric segmentation (TPU-native).

Topology contract: `/root/reference/unetr.py:21-208` (UNETR from Hatamizadeh
et al., arXiv:2103.10504, as vendored from MONAI 0.6 by the reference):

- ViT-B/16^3 encoder; decoder taps hidden states 3/6/9 plus the final
  normed output (`/root/reference/unetr.py:182-208`).
- encoder1 on the raw input at full resolution; encoder2/3/4 progressively
  upsample the token grids by 8x/4x/2x; decoder5..decoder2 upsample and merge
  skips; 1x1x1 out head (`/root/reference/unetr.py:90-175`).
- ``freeze_encoder=True`` runs the ViT + encoders without gradient flow
  (reference wraps them in ``torch.no_grad()`` at `/root/reference/unetr.py:183`;
  here: ``lax.stop_gradient`` over the tapped features, which is the
  functional equivalent for the backward pass).
- The reference's local variant returns ``(enc4, logits)``
  (`/root/reference/unetr.py:208`); the stock MONAI variant used by the
  segmentation script returns logits only
  (`/root/reference/unetr_segmentation_3d.py:501-513`). One class covers
  both via ``return_encoder_features``.

Layout: NDHWC. ``proj_feat`` (`/root/reference/unetr.py:177-180`) is a pure
reshape here — token order (d, h, w, hidden) already matches the channels-last
feature grid, no transpose/copy needed on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg.models.blocks import (
    UnetOutBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
)
from medseg.models.vit import ViT3D

Dtype = Any


class UNETR(nn.Module):
    in_channels: int = 1
    out_channels: int = 14
    img_size: tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    # ctor surface the reference accepts (`/root/reference/unetr.py:36-37,66-67`);
    # every reference run uses "perceptron" + "instance"
    pos_embed: str = "perceptron"
    norm_name: str = "instance"
    res_block: bool = True
    conv_block: bool = False
    dropout_rate: float = 0.0
    dtype: Dtype | None = None
    # Rematerialization of encoder/decoder stages (training memory/time):
    #   True / "all": checkpoint every stage (lowest memory; bwd re-runs the
    #     expensive full-resolution convs);
    #   "lowres": checkpoint only the ViT + <= 24^3 stages whose recompute is
    #     cheap, SAVE the full-resolution activations (enc1 / decoder3 /
    #     decoder2 at crop 96) — ~1.5 GB more HBM at batch 4, skips the
    #     costly part of the remat re-forward in the backward pass;
    #   False: no checkpointing (OOMs at batch 4 x 96^3 on 16 GB).
    remat: bool | str = False

    def setup(self):
        if not 0 <= self.dropout_rate <= 1:
            raise ValueError("dropout_rate should be between 0 and 1.")
        if self.hidden_size % self.num_heads != 0:
            raise ValueError("hidden size should be divisible by num_heads.")
        if self.pos_embed not in ("conv", "perceptron"):
            # same enum + exception class as the reference ctor
            # (`/root/reference/unetr.py:66-67`)
            raise KeyError(
                f"Position embedding layer of type {self.pos_embed} is not supported."
            )
        if self.norm_name != "instance":
            # the reference forwards norm_name to the MONAI blocks but every
            # run uses "instance" (`unetr_segmentation_3d.py:509`); the fused
            # serving/training kernels bake instance-norm epilogues, so other
            # norms are rejected loudly rather than silently approximated
            raise ValueError(
                f"norm_name {self.norm_name!r} is not supported (only 'instance'; "
                "the TPU kernel epilogues compute instance statistics)"
            )
        p = self.patch_size
        self.feat_size = tuple(s // p for s in self.img_size)
        self.vit = ViT3D(
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            patch_size=p,
            dropout_rate=self.dropout_rate,
            pos_embed=self.pos_embed,
            dtype=self.dtype,
            remat=bool(self.remat),
        )
        fs = self.feature_size
        remat_all = self.remat in (True, "all")
        remat_low = remat_all or self.remat == "lowres"
        basic = nn.remat(UnetrBasicBlock) if remat_all else UnetrBasicBlock
        prup = nn.remat(UnetrPrUpBlock) if remat_low else UnetrPrUpBlock
        up_low = nn.remat(UnetrUpBlock) if remat_low else UnetrUpBlock
        up_full = nn.remat(UnetrUpBlock) if remat_all else UnetrUpBlock
        self.encoder1 = basic(fs, res_block=self.res_block, dtype=self.dtype)
        self.encoder2 = prup(
            fs * 2, num_layer=2, conv_block=self.conv_block, res_block=self.res_block, dtype=self.dtype
        )
        self.encoder3 = prup(
            fs * 4, num_layer=1, conv_block=self.conv_block, res_block=self.res_block, dtype=self.dtype
        )
        self.encoder4 = prup(
            fs * 8, num_layer=0, conv_block=self.conv_block, res_block=self.res_block, dtype=self.dtype
        )
        self.decoder5 = up_low(fs * 8, res_block=self.res_block, dtype=self.dtype)
        self.decoder4 = up_low(fs * 4, res_block=self.res_block, dtype=self.dtype)
        self.decoder3 = up_full(fs * 2, res_block=self.res_block, dtype=self.dtype)
        self.decoder2 = up_full(fs, res_block=self.res_block, dtype=self.dtype)
        self.out = UnetOutBlock(self.out_channels, dtype=self.dtype)

    def proj_feat(self, tokens: jax.Array) -> jax.Array:
        """(B, N, hidden) -> (B, fd, fh, fw, hidden); a free reshape in NDHWC."""
        b = tokens.shape[0]
        fd, fh, fw = self.feat_size
        return tokens.reshape(b, fd, fh, fw, self.hidden_size)

    def __call__(
        self,
        x_in: jax.Array,
        *,
        freeze_encoder: bool = False,
        deterministic: bool = True,
        return_encoder_features: bool = True,
    ):
        """Forward pass.

        Args:
          x_in: (B, D, H, W, C) volume batch.
          freeze_encoder: stop gradients through the ViT + encoder taps
            (reference `freeze_encoder`, `/root/reference/unetr.py:182-192`).
          return_encoder_features: if True return ``(enc4, logits)`` like the
            reference's local variant, else logits only (stock MONAI variant).
        """
        x, hidden_states = self.vit(x_in, deterministic=deterministic)
        # Skip taps at quarter depths: 3/6/9 for the reference's fixed 12
        # layers (`/root/reference/unetr.py:187-201`), scaled for other depths.
        q = self.num_layers // 4
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self.proj_feat(hidden_states[1 * q]))
        enc3 = self.encoder3(self.proj_feat(hidden_states[2 * q]))
        enc4 = self.encoder4(self.proj_feat(hidden_states[3 * q]))
        dec4 = self.proj_feat(x)
        if freeze_encoder:
            x = jax.lax.stop_gradient(x)
            enc1 = jax.lax.stop_gradient(enc1)
            enc2 = jax.lax.stop_gradient(enc2)
            enc3 = jax.lax.stop_gradient(enc3)
            enc4 = jax.lax.stop_gradient(enc4)
            dec4 = jax.lax.stop_gradient(dec4)
        dec3 = self.decoder5(dec4, enc4)
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        outf = self.decoder2(dec1, enc1)
        logits = self.out(outf)
        if return_encoder_features:
            return enc4, logits
        return logits


def unetr_b16(
    in_channels: int, out_channels: int, crop_size: int, dtype=None,
    remat: bool | str = False,
) -> UNETR:
    """The one configuration every reference run uses: ViT-B, feature_size 16
    (`/root/reference/unetr_segmentation_3d.py:501-513`)."""
    return UNETR(
        in_channels=in_channels,
        out_channels=out_channels,
        img_size=(crop_size, crop_size, crop_size),
        feature_size=16,
        hidden_size=768,
        mlp_dim=3072,
        num_heads=12,
        res_block=True,
        dropout_rate=0.0,
        dtype=dtype,
        remat=remat,
    )
