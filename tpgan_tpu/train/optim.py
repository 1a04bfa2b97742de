"""Optimizer factory (reference: UtilityMethods.py:14-41) and the
MultiStepLR schedule (reference: Pretrain.py:126-130), on optax.

torch's ``weight_decay`` is L2 regularisation folded into the gradient
*before* the momentum/adaptive machinery; ``optax.add_decayed_weights``
placed ahead of the transform reproduces that ordering.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import optax

from tpgan_tpu.config import OptimizerConfig

ScalarOrSchedule = Union[float, Callable[[int], float]]


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> Callable[[int], float]:
    """torch MultiStepLR: multiply lr by gamma at each epoch milestone
    (reference: Pretrain.py:126-130; milestones config.py:17-18)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def get_optimizer(
    name: str = "sgd",
    cfg: Optional[OptimizerConfig] = None,
    learning_rate: Optional[ScalarOrSchedule] = None,
) -> optax.GradientTransformation:
    """Resolve an optimizer by name with the reference's hyperparameter
    wiring (reference: UtilityMethods.py:30-39; params config.py:31-35).
    Unknown names fall back to SGD, as the reference does (:39)."""
    cfg = cfg or OptimizerConfig()
    lr = cfg.learning_rate if learning_rate is None else learning_rate
    wd = cfg.weight_decay
    name = (name or "sgd").lower()

    if name == "adam":
        tx = optax.adam(lr)
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, momentum=cfg.momentum)
    elif name == "adagrad":
        tx = optax.adagrad(lr)
    elif name == "adadelta":
        tx = optax.adadelta(lr)
    else:  # 'sgd' and the reference's silent fallback
        tx = optax.sgd(lr, momentum=cfg.momentum, nesterov=cfg.nesterov)

    if wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


def adam_wgan(
    learning_rate: ScalarOrSchedule, beta1: float = 0.5, beta2: float = 0.9
) -> optax.GradientTransformation:
    """Adam with the standard WGAN-GP betas for the G/D optimizers."""
    return optax.adam(learning_rate, b1=beta1, b2=beta2)
