"""Loss library: the 11-term composite GAN objective
(reference: config.py:71-82 + the reconstructed train step, SURVEY.md §3.3)
and the jittable landmark multi-task loss + decoder
(reference: MobileNetV2.py:342-649).
"""

from tpgan_tpu.losses.gan import (
    discriminator_loss,
    generator_adversarial_loss,
    gradient_penalty,
)
from tpgan_tpu.losses.pixel import (
    l1,
    local_pixel_loss,
    multiscale_pixel_loss,
    symmetry_loss,
    total_variation,
)
from tpgan_tpu.losses.composite import generator_loss_components, total_generator_loss
from tpgan_tpu.losses.multitask import multitask_landmark_loss
from tpgan_tpu.losses.decoder import decode_landmarks, masked_nms

__all__ = [
    "discriminator_loss",
    "generator_adversarial_loss",
    "gradient_penalty",
    "l1",
    "local_pixel_loss",
    "multiscale_pixel_loss",
    "symmetry_loss",
    "total_variation",
    "generator_loss_components",
    "total_generator_loss",
    "multitask_landmark_loss",
    "decode_landmarks",
    "masked_nms",
]
