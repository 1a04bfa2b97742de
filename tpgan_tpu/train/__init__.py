"""Training subsystem: optimizer factory, the single-jit WGAN-GP
alternating train step, landmark pretraining, Orbax checkpointing, and
metric writing."""

from tpgan_tpu.train.optim import get_optimizer, multistep_lr
from tpgan_tpu.train.gan_trainer import (
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
    make_synthesize_fn,
)

__all__ = [
    "get_optimizer",
    "multistep_lr",
    "GANTrainState",
    "create_gan_state",
    "make_gan_train_step",
    "make_synthesize_fn",
]
