from .blocks import (
    Conv,
    DepthConvBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride2,
    SubpelConv2x,
    wsilu,
)
from .quant import noise_quant, ste_round

__all__ = [
    "Conv",
    "DepthConvBlock",
    "ResidualBlockUpsample",
    "ResidualBlockWithStride2",
    "SubpelConv2x",
    "wsilu",
    "ste_round",
    "noise_quant",
]
