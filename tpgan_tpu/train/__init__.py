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
from tpgan_tpu.train.loop import run_gan_training
from tpgan_tpu.train.pretrain import (
    PretrainState,
    create_pretrain_state,
    make_pretrain_step,
    run_pretrain,
)
from tpgan_tpu.train.feature_extract import (
    FeatureExtractState,
    run_feature_extract_training,
)
from tpgan_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from tpgan_tpu.train.metrics import MetricWriter, NaNMonitor, Throughput

__all__ = [
    "get_optimizer",
    "multistep_lr",
    "GANTrainState",
    "create_gan_state",
    "make_gan_train_step",
    "make_synthesize_fn",
    "run_gan_training",
    "PretrainState",
    "create_pretrain_state",
    "make_pretrain_step",
    "run_pretrain",
    "FeatureExtractState",
    "run_feature_extract_training",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricWriter",
    "NaNMonitor",
    "Throughput",
]
