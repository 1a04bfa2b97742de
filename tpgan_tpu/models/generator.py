"""Generator — the two-pathway TP-GAN generator: four LocalPathways,
the max-fuser, the GlobalPathway, and the identity classification head
(reference: D_and_G_model.py:331-407).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.models.global_pathway import GlobalPathway
from tpgan_tpu.ops.pallas_kernels import fuse_parts_pallas as fuse_parts
from tpgan_tpu.models.local_pathway import LocalPathway
from tpgan_tpu.ops import initializers as init_lib
from tpgan_tpu.ops.blocks import LinearBlock


class FeaturePredict(nn.Module):
    """Dropout(0.3) + Linear(256 -> num_classes) identity classifier over
    the bottleneck feature (reference: D_and_G_model.py:331-348)."""

    num_classes: int
    global_feature_layer_dim: int = 256
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_dropout: bool = False) -> jnp.ndarray:
        x = nn.Dropout(rate=self.dropout, deterministic=not use_dropout)(x)
        return LinearBlock(
            self.global_feature_layer_dim,
            self.num_classes,
            kernel_init=init_lib.torch_default_linear(),
            dtype=self.dtype,
            name="fc",
        )(x)


class GeneratorOutput(NamedTuple):
    """The reference's 8-tuple return (D_and_G_model.py:407), named."""

    img128_fake: jnp.ndarray        # synthesized frontal face, NHWC 128x128x3
    encoder_predict: jnp.ndarray    # identity logits from the bottleneck
    local_fake: jnp.ndarray         # fused fake-patch mosaic (128x128x3)
    left_eye_fake: jnp.ndarray
    right_eye_fake: jnp.ndarray
    nose_fake: jnp.ndarray
    mouth_fake: jnp.ndarray
    local_origin: jnp.ndarray       # fused ground-truth-patch mosaic


class Generator(nn.Module):
    zdim: int
    num_classes: int
    use_batchnorm: bool = True
    use_residual_block: bool = True
    fm_multiplier: float = 1.0
    local_feature_layer_dim: int = 64
    dtype: Any = jnp.float32
    accum_f32: bool = True  # fast MXU f32-emit convs; False when training
    pad_channel_multiple: Any = None  # see GlobalPathway.pad_channel_multiple
    upsample_mode: str = "deconv"  # see ops.blocks.DeconvBlock.mode

    @nn.compact
    def __call__(
        self,
        i128: jnp.ndarray,
        left_eye: jnp.ndarray,
        right_eye: jnp.ndarray,
        nose: jnp.ndarray,
        mouth: jnp.ndarray,
        z: jnp.ndarray,
        use_dropout: bool = False,
        train: bool = False,
    ) -> GeneratorOutput:
        kw = dict(
            use_batchnorm=self.use_batchnorm,
            dtype=self.dtype,
            fm_multiplier=self.fm_multiplier,
            feature_layer_dim=self.local_feature_layer_dim,
            accum_f32=self.accum_f32,
            upsample_mode=self.upsample_mode,
        )

        # Four independent per-part U-Nets (D_and_G_model.py:363-366,390-393)
        le_img, le_feat = LocalPathway(name="local_left_eye", **kw)(
            left_eye, train=train
        )
        re_img, re_feat = LocalPathway(name="local_right_eye", **kw)(
            right_eye, train=train
        )
        no_img, no_feat = LocalPathway(name="local_nose", **kw)(nose, train=train)
        mo_img, mo_feat = LocalPathway(name="local_mouth", **kw)(mouth, train=train)

        # Max-fuse features, fake patches, and GT patches onto the canvas
        # (D_and_G_model.py:396-398)
        fused_feature = fuse_parts(le_feat, re_feat, no_feat, mo_feat)
        fused_fake = fuse_parts(le_img, re_img, no_img, mo_img)
        fused_origin = fuse_parts(left_eye, right_eye, nose, mouth)

        img128_fake, encoder_feature = GlobalPathway(
            zdim=self.zdim,
            local_feature_layer_dim=self.local_feature_layer_dim,
            use_batchnorm=self.use_batchnorm,
            use_residual_block=self.use_residual_block,
            fm_multiplier=self.fm_multiplier,
            dtype=self.dtype,
            accum_f32=self.accum_f32,
            pad_channel_multiple=self.pad_channel_multiple,
            upsample_mode=self.upsample_mode,
            name="global_pathway",
        )(i128, fused_fake, fused_feature, z, train=train)

        encoder_predict = FeaturePredict(
            self.num_classes, dtype=self.dtype, name="feature_predict"
        )(encoder_feature, use_dropout=use_dropout)

        return GeneratorOutput(
            img128_fake=img128_fake,
            encoder_predict=encoder_predict,
            local_fake=fused_fake,
            left_eye_fake=le_img,
            right_eye_fake=re_img,
            nose_fake=no_img,
            mouth_fake=mo_img,
            local_origin=fused_origin,
        )
