"""GlobalPathway — 128x128 encoder–decoder with skip connections, a
256-d identity bottleneck, and local-feature injection at full resolution
(reference: D_and_G_model.py:161-329).

Documented fix (channel-arithmetic bug in the reference, SURVEY.md §3.2):
the reference sizes ``add_conv_and_deconv_128`` for 72 input channels
(conv0 64 + deconv_128 8, D_and_G_model.py:268-269) but feeds it
``cat[deconv_128, conv0, I128]`` = 75 channels (:323), so the reference
GlobalPathway cannot run as written. We size the block for the actual 75
(including I128's 3 channels), keeping the forward dataflow of :323-324.

Second documented deviation: the reference hardcodes encoder
ResidualBlock widths (64/128/256/512) even when ``fm_multiplier`` scales
the conv widths (D_and_G_model.py:192-209) — broken for any
fm_multiplier != 1. We scale the residual blocks consistently.

``use_residual_block`` is accepted for config parity but, exactly like
the reference (:188 stores it, forward never reads it), does not alter
the graph.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.ops.activations import LEAKY_RELU, RELU, leaky_relu
from tpgan_tpu.ops.blocks import ConvBlock, DeconvBlock, LinearBlock, ResidualBlock
from tpgan_tpu.ops import initializers as init_lib
from tpgan_tpu.utils.misc import scale_channels


class GlobalPathway(nn.Module):
    zdim: int
    local_feature_layer_dim: int = 64
    use_batchnorm: bool = True
    use_residual_block: bool = True  # parity no-op, see module docstring
    scaling_factor: float = 1.0
    fm_multiplier: float = 1.0
    dtype: Any = jnp.float32
    accum_f32: bool = True  # see ops.blocks.Conv2d.accum_f32
    # MXU channel alignment for the off-tile concat blocks
    # (75/203/206/208 at full size) — see ops.blocks.Conv2d.pad_in_multiple.
    # Applied to every block; the half-tile guard skips narrow inputs.
    pad_channel_multiple: Any = None
    upsample_mode: str = "deconv"  # see ops.blocks.DeconvBlock.mode

    @nn.compact
    def __call__(
        self,
        i128: jnp.ndarray,
        local_fake_image: jnp.ndarray,
        local_feature: jnp.ndarray,
        z: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = scale_channels([64, 64, 128, 256, 512], self.fm_multiplier)
        dec = scale_channels([64, 32, 16, 8], self.fm_multiplier)
        enh = scale_channels([512, 256, 128, 64], self.fm_multiplier)
        head = scale_channels([64, 32], self.fm_multiplier)
        kw = dict(use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                  accum_f32=self.accum_f32,
                  pad_in_multiple=self.pad_channel_multiple)
        dkw = dict(kw, mode=self.upsample_mode)  # DeconvBlock-only kwargs
        rb_kw = dict(scaling_factor=self.scaling_factor, dtype=self.dtype,
                     accum_f32=self.accum_f32,
                     pad_in_multiple=self.pad_channel_multiple)
        lrelu2 = leaky_relu(1e-2)

        def enc_stage(name, cin, cout, k, stride, pad, n_res):
            def f(h):
                h = ConvBlock(
                    cin, cout, k, stride, pad, "kaiming", lrelu2,
                    name=f"{name}_conv", **kw,
                )(h, train=train)
                for i in range(n_res):
                    h = ResidualBlock(
                        cout, cout, k if stride == 1 else k, 1, pad,
                        "kaiming", lrelu2, name=f"{name}_res{i}", **rb_kw,
                    )(h, train=train)
                return h

            return f

        # ---- encoder (D_and_G_model.py:192-209) ----
        conv0 = enc_stage("conv0", 3, enc[0], 7, 1, 3, 1)(i128)        # 128x128
        conv1 = enc_stage("conv1", enc[0], enc[1], 5, 2, 2, 1)(conv0)  # 64x64
        conv2 = enc_stage("conv2", enc[1], enc[2], 3, 2, 1, 1)(conv1)  # 32x32
        conv3 = enc_stage("conv3", enc[2], enc[3], 3, 2, 1, 1)(conv2)  # 16x16
        conv4 = enc_stage("conv4", enc[3], enc[4], 3, 2, 1, 4)(conv3)  # 8x8

        # ---- bottleneck: fc1 (512) -> pairwise-max pool -> fc2 (256)
        # (D_and_G_model.py:212-214, :289-290) ----
        b = conv4.shape[0]
        flat = conv4.reshape(b, -1)
        fc1 = LinearBlock(
            enc[4] * 8 * 8, 512, kernel_init=init_lib.torch_default_linear(),
            dtype=self.dtype, name="fc1",
        )(flat, train=train)
        fc2 = jnp.max(fc1.reshape(b, 256, 2), axis=-1)  # MaxPool1d(2,2)

        # ---- decoder trunk from cat(fc2, z) as a 1x1 map
        # (D_and_G_model.py:218-224, :293-296) ----
        trunk_in = jnp.concatenate([fc2, z.astype(fc2.dtype)], axis=-1)
        trunk_in = trunk_in.reshape(b, 1, 1, 256 + self.zdim)
        deconv_8 = DeconvBlock(
            256 + self.zdim, dec[0], 8, 1, 0, 0, "kaiming", RELU,
            name="deconv_8", **dkw,
        )(trunk_in, train=train)                                    # 8x8
        deconv_32 = DeconvBlock(
            dec[0], dec[1], 3, 4, 0, 1, "kaiming", RELU, name="deconv_32", **dkw
        )(deconv_8, train=train)                                    # 32x32
        deconv_64 = DeconvBlock(
            dec[1], dec[2], 3, 2, 1, 1, "kaiming", RELU, name="deconv_64", **dkw
        )(deconv_32, train=train)                                   # 64x64
        deconv_128 = DeconvBlock(
            dec[2], dec[3], 3, 2, 1, 1, "kaiming", RELU, name="deconv_128", **dkw
        )(deconv_64, train=train)                                   # 128x128

        # ---- scale 8: fuse trunk + conv4, refine, upsample
        # (D_and_G_model.py:233-239, :298-303) ----
        dim8 = dec[0] + enc[4]
        h = jnp.concatenate([deconv_8, conv4], axis=-1)
        h = ResidualBlock(
            dim8, dim8, 2, 1, (1, 0, 1, 0), activation=LEAKY_RELU,
            name="add_8", dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(h, train=train)
        for i in range(2):
            h = ResidualBlock(
                dim8, dim8, 2, 1, (1, 0, 1, 0), activation=LEAKY_RELU,
                name=f"enhance_8_{i}", dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
            )(h, train=train)
        assert h.shape[1] == 8, h.shape
        h = DeconvBlock(
            dim8, enh[0], 3, 2, 1, 1, "kaiming", RELU, name="upsample_16", **dkw
        )(h, train=train)

        # ---- scale 16 (D_and_G_model.py:242-247, :306-309) ----
        a16 = ResidualBlock(
            enc[3], activation=LEAKY_RELU, name="add_16", dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(conv3, train=train)
        h = jnp.concatenate([h, a16], axis=-1)
        dim16 = enh[0] + enc[3]
        for i in range(2):
            h = ResidualBlock(
                dim16, activation=LEAKY_RELU, name=f"enhance_16_{i}",
                dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
            )(h, train=train)
        assert h.shape[1] == 16, h.shape
        h = DeconvBlock(
            dim16, enh[1], 3, 2, 1, 1, "kaiming", RELU, name="upsample_32", **dkw
        )(h, train=train)

        # ---- scale 32 (D_and_G_model.py:250-256, :311-315) ----
        dim32 = enc[2] + dec[1]
        a32 = ResidualBlock(
            dim32, activation=LEAKY_RELU, name="add_32", dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(jnp.concatenate([deconv_32, conv2], axis=-1), train=train)
        h = jnp.concatenate([h, a32], axis=-1)
        dim32e = enh[1] + dim32
        for i in range(2):
            h = ResidualBlock(
                dim32e, activation=LEAKY_RELU, name=f"enhance_32_{i}",
                dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
            )(h, train=train)
        h = DeconvBlock(
            dim32e, enh[2], 3, 2, 1, 1, "kaiming", RELU, name="upsample_64", **dkw
        )(h, train=train)

        # ---- scale 64 (D_and_G_model.py:259-265, :317-321) ----
        dim64 = enc[1] + dec[2]
        a64 = ResidualBlock(
            dim64, kernel_size=5, activation=LEAKY_RELU, name="add_64",
            dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(jnp.concatenate([deconv_64, conv1], axis=-1), train=train)
        h = jnp.concatenate([h, a64], axis=-1)
        dim64e = enh[2] + dim64
        for i in range(2):
            h = ResidualBlock(
                dim64e, activation=LEAKY_RELU, name=f"enhance_64_{i}",
                dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
            )(h, train=train)
        h = DeconvBlock(
            dim64e, enh[3], 3, 2, 1, 1, "kaiming", RELU, name="upsample_128", **dkw
        )(h, train=train)

        # ---- scale 128 with local injection
        # (D_and_G_model.py:268-271, :323-324; 75-channel fix, see docstring) ----
        dim128 = dec[3] + enc[0] + 3
        a128 = ResidualBlock(
            dim128, kernel_size=7, activation=LEAKY_RELU, name="add_128",
            dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(jnp.concatenate([deconv_128, conv0, i128.astype(h.dtype)], axis=-1),
          train=train)
        h = jnp.concatenate(
            [h, a128, local_feature.astype(h.dtype),
             local_fake_image.astype(h.dtype)],
            axis=-1,
        )
        dim128e = enh[3] + dim128 + self.local_feature_layer_dim + 3
        h = ResidualBlock(
            dim128e, kernel_size=5, activation=LEAKY_RELU, name="enhance_128",
            dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(h, train=train)

        # ---- head (D_and_G_model.py:274-279, :326-328) ----
        h = ConvBlock(
            dim128e, head[0], 5, 1, 2, "kaiming", LEAKY_RELU, name="conv5_conv", **kw
        )(h, train=train)
        h = ResidualBlock(
            head[0], kernel_size=3, activation=LEAKY_RELU, name="conv5_res",
            dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
        )(h, train=train)
        h = ConvBlock(
            head[0], head[1], 3, 1, 1, "kaiming", LEAKY_RELU, name="conv6", **kw
        )(h, train=train)
        decoded = ConvBlock(
            head[1], 3, 3, 1, 1, None, None, use_batchnorm=False,
            dtype=self.dtype, accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_channel_multiple,
            name="decoded_img128",
        )(h, train=train)
        return decoded, fc2
