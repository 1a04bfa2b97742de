"""The composite generator objective — all weighted terms of
config.py:71-82 assembled exactly as the reconstructed train step
specifies (SURVEY.md §3.3):

    weight_adv_G      * (-E[D(fake)])
  + weight_pixelwise  * multiscale L1 (128/64/32, scale weights)
  + weight_pixelwise_local * L1(fused fake patches, fused frontal patches)
  + weight_symmetry   * L1(fake, mirror(fake))
  + weight_total_varation * TV(fake)
  + weight_identity_preserving * L1(embed(fake), embed(frontal))
  + weight_cross_entropy * CE(encoder_predict, subject label)
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import optax

from tpgan_tpu.config import LossConfig
from tpgan_tpu.losses.gan import generator_adversarial_loss
from tpgan_tpu.losses.pixel import (
    l1,
    local_pixel_loss,
    multiscale_pixel_loss,
)
from tpgan_tpu.ops.pallas_kernels import symmetry_tv_losses


def generator_loss_components(
    *,
    fake128: jnp.ndarray,
    fake_scores: jnp.ndarray,
    encoder_predict: jnp.ndarray,
    fused_local_fake: jnp.ndarray,
    fused_local_frontal: jnp.ndarray,
    gt128: jnp.ndarray,
    gt64: jnp.ndarray,
    gt32: jnp.ndarray,
    labels: jnp.ndarray,
    cfg: LossConfig,
    identity_embed: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Every G-loss component, unweighted (weights applied in
    :func:`total_generator_loss` so metrics can log both)."""
    # symmetry + TV in one fused pass (Pallas on TPU)
    sym, tv = symmetry_tv_losses(fake128)
    comps = {
        "adv_G": generator_adversarial_loss(fake_scores),
        "pixelwise": multiscale_pixel_loss(
            fake128, gt128, gt64, gt32,
            cfg.weight_128, cfg.weight_64, cfg.weight_32,
        ),
        "pixelwise_local": local_pixel_loss(fused_local_fake, fused_local_frontal),
        "symmetry": sym,
        "total_variation": tv,
        "cross_entropy": jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                encoder_predict.astype(jnp.float32), labels
            )
        ),
    }
    if identity_embed is not None:
        comps["identity_preserving"] = l1(
            identity_embed(fake128), identity_embed(gt128)
        )
    else:
        comps["identity_preserving"] = jnp.zeros((), jnp.float32)
    return comps


def total_generator_loss(
    comps: Mapping[str, jnp.ndarray], cfg: LossConfig
) -> jnp.ndarray:
    return (
        cfg.weight_adv_G * comps["adv_G"]
        + cfg.weight_pixelwise * comps["pixelwise"]
        + cfg.weight_pixelwise_local * comps["pixelwise_local"]
        + cfg.weight_symmetry * comps["symmetry"]
        + cfg.weight_total_varation * comps["total_variation"]
        + cfg.weight_identity_preserving * comps["identity_preserving"]
        + cfg.weight_cross_entropy * comps["cross_entropy"]
    )
