from medseg.models.vit import ViT3D, PatchEmbed3D, TransformerBlock
from medseg.models.blocks import (
    InstanceNorm,
    UnetResBlock,
    UnetBasicBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
    UnetOutBlock,
)
from medseg.models.unetr import UNETR

__all__ = [
    "ViT3D",
    "PatchEmbed3D",
    "TransformerBlock",
    "InstanceNorm",
    "UnetResBlock",
    "UnetBasicBlock",
    "UnetrBasicBlock",
    "UnetrPrUpBlock",
    "UnetrUpBlock",
    "UnetOutBlock",
    "UNETR",
]
