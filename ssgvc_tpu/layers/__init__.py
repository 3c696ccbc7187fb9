from .blocks import (
    DepthConvBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride2,
    SubpelConv2x,
    conv,
    wsilu,
)
from .quant import noise_quant, ste_round

__all__ = [
    "conv",
    "DepthConvBlock",
    "ResidualBlockUpsample",
    "ResidualBlockWithStride2",
    "SubpelConv2x",
    "wsilu",
    "ste_round",
    "noise_quant",
]
