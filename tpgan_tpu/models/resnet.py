"""ResNet18 identity embedder — reconstructed to actually build
(reference: ResNet.py:5-125, which cannot construct as written:
``conv1`` passes the activation into the init slot and a nonexistent
``bias=`` kwarg (:31), ``_build_blocks`` passes stride into
ResidualBlock's kernel_size slot (:75), the loop builds only 3 of 4
sections (:38), and the ``resnet18`` factory calls a mismatched ctor
(:121-125) — SURVEY.md §2 #29).

Reconstruction decisions (documented):

* 4 sections of 2 residual blocks each at widths 64/128/256/512, matching
  the reference's ``num_features``/``num_sections`` tables (:28-29).
* All residual blocks run stride 1 — the reference explicitly passes
  stride=1 (:40) and its block semantics never applied stride to the main
  path anyway; channel transitions use a 1x1 projection shortcut.
* Stem: 7x7 s2 conv + BN + act, then 3x3 s2 maxpool (:31-33), so a
  128x128 input yields 32x32 section maps and a 512-d pooled feature.
* Optional pre-FC bottleneck ``FC0`` (:48-49) whose activations are the
  identity-preserving feature; forward returns (logits, fc0_features)
  (:119).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from tpgan_tpu.ops.activations import RELU, Activation
from tpgan_tpu.ops.blocks import ConvBlock, LinearBlock, ResidualBlock

NUM_FEATURES = (64, 128, 256, 512)
NUM_SECTIONS = (2, 2, 2, 2)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2, 1) on NHWC."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNet18(nn.Module):
    num_of_output_classes: int = 1000
    use_batchnorm: bool = True
    feature_layer_dim_before_fc: Optional[int] = None
    activation: Activation = RELU
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    accum_f32: bool = True  # False when training

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_dropout: bool = False, train: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        kw = dict(use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                  accum_f32=self.accum_f32)
        h = ConvBlock(
            3, NUM_FEATURES[0], 7, 2, 3, "kaiming", self.activation,
            name="conv1", **kw,
        )(x, train=train)
        h = max_pool_3x3_s2(h)

        cin = NUM_FEATURES[0]
        for sec, (width, n_blocks) in enumerate(zip(NUM_FEATURES, NUM_SECTIONS)):
            for blk in range(n_blocks):
                project = cin != width
                h = ResidualBlock(
                    cin, width, 3, 1,
                    activation=self.activation,
                    use_projection=project,
                    use_batchnorm=self.use_batchnorm,
                    dtype=self.dtype,
                    accum_f32=self.accum_f32,
                    name=f"section{sec}_block{blk}",
                )(h, train=train)
                cin = width

        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1)

        fc0_out = None
        if self.feature_layer_dim_before_fc is not None:
            h = LinearBlock(
                NUM_FEATURES[-1], self.feature_layer_dim_before_fc,
                use_batchnorm=self.use_batchnorm, dtype=self.dtype, name="fc0",
            )(h, train=train)
            fc0_out = h

        h = nn.Dropout(rate=self.dropout_rate, deterministic=not use_dropout)(h)

        fc_in = (
            self.feature_layer_dim_before_fc
            if self.feature_layer_dim_before_fc is not None
            else NUM_FEATURES[-1]
        )
        logits = LinearBlock(
            fc_in, self.num_of_output_classes, dtype=self.dtype, name="fc"
        )(h, train=train)
        return logits, fc0_out
