"""FeatureExtractModel — the identity-preserving embedder wrapper that
selects a ResNet18 or MobileNetV2 backbone and attaches a
``num_of_output_classes`` classification head
(reference: FeatureExtract.py:5-41).

The reference's MobileNetV2 branch dereferences a nonexistent ``.FC``
attribute (:34 — its MobileNetV2 is an SSD landmark model with no
classifier head). We implement what that branch intends: the standard
MobileNetV2 image classifier (stem + inverted residuals + 1x1 conv to
1280 + global average pool) with a Dropout(0.2) + Linear head, built from
the same InvertedResidual blocks as the landmark model.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.models.mobilenet_v2 import INVERTED_RESIDUAL_SETTING, InvertedResidual
from tpgan_tpu.models.resnet import ResNet18
from tpgan_tpu.ops import initializers as init_lib
from tpgan_tpu.ops.activations import RELU6, apply_activation
from tpgan_tpu.ops.blocks import BatchNorm2d, Conv2d, LinearBlock


class MobileNetV2Classifier(nn.Module):
    """MobileNetV2 backbone as an image classifier (the intended
    FeatureExtract.py:24-38 branch). Returns (logits, pooled_features)."""

    num_of_output_classes: int = 1000
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32
    accum_f32: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_dropout: bool = False, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        he = dict(kernel_init=init_lib.he_ssd_conv(), bias_init=init_lib.zeros)
        h = Conv2d(
            3, 32, 3, 2, 1, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="stem", **he
        )(x)
        h = BatchNorm2d(32, dtype=self.dtype, name="stem_bn")(h, train=train)
        h = apply_activation(h, RELU6)
        cin = 32
        idx = 0
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for rep in range(n):
                h = InvertedResidual(
                    cin, c, s if rep == 0 else 1, t, dtype=self.dtype,
                    accum_f32=self.accum_f32, name=f"block{idx}",
                )(h, train=train)
                cin = c
                idx += 1
        h = Conv2d(
            320, 1280, 1, 1, 0, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="conv2", **he
        )(h)
        h = BatchNorm2d(1280, dtype=self.dtype, name="conv2_bn")(h, train=train)
        h = apply_activation(h, RELU6)
        pooled = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(rate=self.dropout_rate, deterministic=not use_dropout)(pooled)
        logits = LinearBlock(
            1280, self.num_of_output_classes,
            kernel_init=init_lib.normal(0.01), dtype=self.dtype, name="fc",
        )(h, train=train)
        return logits, pooled


class FeatureExtractModel(nn.Module):
    base_model_name: str = "resnet"
    num_of_output_classes: int = 1000
    feature_layer_dim_before_fc: Optional[int] = 256
    dtype: Any = jnp.float32
    accum_f32: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_dropout: bool = False, train: bool = False
    ):
        name = self.base_model_name.lower()
        if name == "resnet":
            return ResNet18(
                num_of_output_classes=self.num_of_output_classes,
                feature_layer_dim_before_fc=self.feature_layer_dim_before_fc,
                dtype=self.dtype,
                accum_f32=self.accum_f32,
                name="base",
            )(x, use_dropout=use_dropout, train=train)
        if name == "mobilenetv2":
            return MobileNetV2Classifier(
                num_of_output_classes=self.num_of_output_classes,
                dtype=self.dtype,
                accum_f32=self.accum_f32,
                name="base",
            )(x, use_dropout=use_dropout, train=train)
        raise ValueError(
            "feature extraction supports only 'resnet' or 'mobilenetv2' "
            "(reference: FeatureExtract.py:27)"
        )


def make_identity_embed_fn(model: FeatureExtractModel, variables):
    """Freeze an embedder into the closure the GAN train step consumes:
    image -> identity feature (FC0 features for ResNet18, pooled features
    for MobileNetV2). Used by the identity-preserving loss
    (weights: config.py:80; resume path: config.py:84-85)."""

    def embed(images: jnp.ndarray) -> jnp.ndarray:
        # match the model's compute dtype (e.g. an opt-in bf16 embedder
        # fed f32 generator output); the cast is differentiable, so the
        # identity loss still backpropagates into the generator
        logits, feats = model.apply(variables, images.astype(model.dtype))
        return feats if feats is not None else logits

    return embed
