from .layers import (
    Conv2d,
    ConvTranspose2d,
    Dense,
    LayerNorm2d,
    DropPath,
    Identity,
    pixel_shuffle,
    pixel_unshuffle,
)
from .ss2d import SS2D
from .vss import VSSBlock, GDMlp, Mlp, GMlp, FFNv02

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Dense",
    "LayerNorm2d",
    "DropPath",
    "Identity",
    "pixel_shuffle",
    "pixel_unshuffle",
    "SS2D",
    "VSSBlock",
    "GDMlp",
    "Mlp",
    "GMlp",
    "FFNv02",
]
