"""Model zoo: the TP-GAN two-pathway Generator/Discriminator family, the
MobileNetV2+SSD landmark detector, and the ResNet18 identity embedder.

All models are Flax linen modules over NHWC tensors. Use
``tpgan_tpu.models.registry`` to resolve models by name (replaces the
reference's ``eval(pretrain['model_name'])`` at Pretrain.py:113).
"""

from tpgan_tpu.models.local_pathway import LocalPathway
from tpgan_tpu.models.local_fuser import fuse_parts, PART_GEOMETRY, CANVAS_SIZE
from tpgan_tpu.models.global_pathway import GlobalPathway
from tpgan_tpu.models.generator import FeaturePredict, Generator, GeneratorOutput
from tpgan_tpu.models.discriminator import Discriminator

__all__ = [
    "LocalPathway",
    "fuse_parts",
    "PART_GEOMETRY",
    "CANVAS_SIZE",
    "GlobalPathway",
    "FeaturePredict",
    "Generator",
    "GeneratorOutput",
    "Discriminator",
]
