"""Discriminator — PatchGAN critic: five stride-2 convs
(3->64->128->256->512->512) with residual blocks from the fourth layer on,
and a 1-channel head producing a 4x4 map of local realism scores on
128x128 inputs (reference: D_and_G_model.py:409-435).

``use_batchnorm`` defaults False per the WGAN-GP configuration
(config.py:68,72) — gradient penalty and BatchNorm don't mix.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.ops.activations import LEAKY_RELU, leaky_relu
from tpgan_tpu.ops.blocks import ConvBlock, ResidualBlock
from tpgan_tpu.utils.misc import scale_channels


class Discriminator(nn.Module):
    use_batchnorm: bool = False
    fm_multiplier: float = 1.0
    dtype: Any = jnp.float32
    accum_f32: bool = True  # False when training (double grads for WGAN-GP)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Documented deviation: the reference scales the whole channel list
        # including the RGB input (D_and_G_model.py:421-422), which breaks
        # for any fm_multiplier != 1; we keep the input at 3.
        n_fmap = [3] + scale_channels([64, 128, 256, 512, 512], self.fm_multiplier)
        lrelu2 = leaky_relu(1e-2)
        h = x
        for i in range(len(n_fmap) - 1):
            h = ConvBlock(
                n_fmap[i], n_fmap[i + 1], 3, 2, 1, "kaiming", lrelu2,
                use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                accum_f32=self.accum_f32, name=f"conv{i}",
            )(h, train=train)
            if i >= 3:  # residual blocks from layer 4 (D_and_G_model.py:428-429)
                h = ResidualBlock(
                    n_fmap[i + 1], activation=LEAKY_RELU, dtype=self.dtype,
                    accum_f32=self.accum_f32, name=f"res{i}",
                )(h, train=train)
        return ConvBlock(
            n_fmap[-1], 1, 3, 1, 1, None, None, use_batchnorm=False,
            dtype=self.dtype, accum_f32=self.accum_f32, name="head",
        )(h, train=train)
