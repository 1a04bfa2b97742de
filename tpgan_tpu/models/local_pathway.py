"""LocalPathway — per-patch U-Net that reconstructs a face part and
emits a feature map for the global decoder
(reference: D_and_G_model.py:18-110).

Architecture (channels at FM_multiplier=1.0):

    encoder: conv0 3->64 (s1) | conv1 64->128 (s2) | conv2 128->256 (s2)
             | conv3 256->512 (s2), each = ConvBlock + ResidualBlock
    decoder: deconv0 512->256, skip-concat conv2, after_select0 -> 256
             deconv1 256->128, skip-concat conv1, after_select1 -> 128
             deconv2 128->feature_dim, skip-concat conv0, after_select2
    head:    1x1 conv -> 3-channel patch image (no init/act,
             D_and_G_model.py:81)

Returns ``(local_img, deconv2)`` — note the feature output is the raw
deconv2 activation, *before* after_select2 (D_and_G_model.py:110).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.ops.activations import LEAKY_RELU, RELU, leaky_relu
from tpgan_tpu.ops.blocks import ConvBlock, DeconvBlock, ResidualBlock
from tpgan_tpu.utils.misc import scale_channels


class LocalPathway(nn.Module):
    use_batchnorm: bool = True
    feature_layer_dim: int = 64
    fm_multiplier: float = 1.0
    dtype: Any = jnp.float32
    accum_f32: bool = True  # see ops.blocks.Conv2d.accum_f32
    upsample_mode: str = "deconv"  # see ops.blocks.DeconvBlock.mode

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = scale_channels([64, 128, 256, 512], self.fm_multiplier)
        dec = scale_channels([256, 128], self.fm_multiplier)
        kw = dict(use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                  accum_f32=self.accum_f32)
        lrelu2 = leaky_relu(1e-2)

        def enc_stage(name, cin, cout, stride):
            def f(h):
                h = ConvBlock(
                    cin, cout, 3, stride, 1, "kaiming", lrelu2, name=f"{name}_conv", **kw
                )(h, train=train)
                return ResidualBlock(
                    cout, activation=LEAKY_RELU, name=f"{name}_res",
                    dtype=self.dtype, accum_f32=self.accum_f32,
                )(h, train=train)

            return f

        conv0 = enc_stage("conv0", 3, enc[0], 1)(x)
        conv1 = enc_stage("conv1", enc[0], enc[1], 2)(conv0)
        conv2 = enc_stage("conv2", enc[1], enc[2], 2)(conv1)
        conv3 = enc_stage("conv3", enc[2], enc[3], 2)(conv2)

        def dec_stage(name, cin, cout, skip, skip_ch):
            def f(h):
                h = DeconvBlock(
                    cin, cout, 3, 2, 1, 1, "kaiming", RELU,
                    mode=self.upsample_mode, name=f"{name}_deconv", **kw
                )(h, train=train)
                up = h
                h = jnp.concatenate([h, skip], axis=-1)
                h = ConvBlock(
                    cout + skip_ch, cout, 3, 1, 1, "kaiming", LEAKY_RELU,
                    name=f"{name}_select_conv", **kw,
                )(h, train=train)
                h = ResidualBlock(
                    cout, activation=LEAKY_RELU, name=f"{name}_select_res",
                    dtype=self.dtype, accum_f32=self.accum_f32,
                )(h, train=train)
                return h, up

            return f

        h, _ = dec_stage("dec0", enc[3], dec[0], conv2, enc[2])(conv3)
        h, _ = dec_stage("dec1", dec[0], dec[1], conv1, enc[1])(h)
        h, deconv2 = dec_stage(
            "dec2", dec[1], self.feature_layer_dim, conv0, enc[0]
        )(h)

        local_img = ConvBlock(
            self.feature_layer_dim, 3, 1, 1, 0, None, None,
            use_batchnorm=False, dtype=self.dtype, accum_f32=self.accum_f32,
            name="local_img",
        )(h, train=train)

        assert local_img.shape == x.shape, (local_img.shape, x.shape)
        return local_img, deconv2
