"""tpgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of PandaKenWei/TP-GAN (profile-to-frontal face synthesis,
arXiv 1704.04086).

Layout conventions
------------------
* Images are NHWC (TPU-native), float32 or bfloat16, value range [-1, 1]
  for GAN tensors and [0, 1] for the landmark-pretrain path (mirrors the
  reference's ToTensor vs ToTensor*2-1 split).
* Parameters live in Flax linen variable collections: ``params`` and
  ``batch_stats`` (BatchNorm running statistics).
* All modules are pure; training state is explicit pytrees.

Reference parity: every module cites the reference file:line it re-designs
(`/root/reference/...`). This is a ground-up TPU-first implementation,
not a translation — convs run through XLA onto the MXU, elementwise work
is fused by XLA or hand-written Pallas kernels, and scaling is expressed
as jax.sharding annotations over a device mesh rather than device loops.
"""

__version__ = "0.1.0"

from tpgan_tpu import config as config  # noqa: F401
