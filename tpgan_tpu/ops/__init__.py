"""Functional layer library — the TPU-native re-design of the reference's
layer factory module (reference: ModificationLayer.py).

Everything here is a Flax linen module or a pure function over pytrees.
Convs lower to XLA's MXU convolution; elementwise epilogues (bias, BN,
LeakyReLU, residual add) are left to XLA fusion, with Pallas kernels in
``tpgan_tpu.ops.pallas_kernels`` for the patterns XLA does not fuse well
(the LocalFuser scatter-max and reduction-heavy loss epilogues).
"""

from tpgan_tpu.ops.activations import Activation, apply_activation, negative_slope
from tpgan_tpu.ops.blocks import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    ConvBlock,
    DeconvBlock,
    LinearBlock,
    ResidualBlock,
    Sequential,
)
from tpgan_tpu.ops import initializers

__all__ = [
    "Activation",
    "apply_activation",
    "negative_slope",
    "BatchNorm2d",
    "Conv2d",
    "ConvTranspose2d",
    "ConvBlock",
    "DeconvBlock",
    "LinearBlock",
    "ResidualBlock",
    "Sequential",
    "initializers",
]
