"""Identity-embedder training — the capability the reference *assumes*
(it loads a trained resnet18 from ``feature_extract_model['resume']``,
config.py:84-85) but provides no training script for.

A plain jitted classification loop: FeatureExtractModel forward ->
softmax cross-entropy over subject identities -> SGD/Adam update. The
trained FC0 features feed the GAN's identity-preserving loss
(weights: config.py:80; wiring: train/gan_trainer.py identity_embed).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import flax.struct
import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpgan_tpu.config import Config
from tpgan_tpu.models.feature_extract import FeatureExtractModel
from tpgan_tpu.train.optim import get_optimizer


class FeatureExtractState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_feature_extract_state(
    cfg: Config, rng: jax.Array, image_size: int = 128
) -> Tuple[FeatureExtractState, FeatureExtractModel, optax.GradientTransformation]:
    model = FeatureExtractModel(
        base_model_name=cfg.feature_extract_model.base_model_name,
        num_of_output_classes=cfg.feature_extract_model.num_of_output_classes,
        accum_f32=False,  # training differentiates the convs
    )
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    )
    tx = get_optimizer(cfg.pretrain.optimizer, cfg.optimizer_param)
    state = FeatureExtractState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return state, model, tx


def make_feature_extract_step(model: FeatureExtractModel, tx):
    def train_step(
        state: FeatureExtractState,
        images: jnp.ndarray,
        labels: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[FeatureExtractState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            (logits, _feats), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                use_dropout=True,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                )
            )
            acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
            return loss, (acc, mutated["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = FeatureExtractState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def run_feature_extract_training(
    cfg: Config,
    batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    *,
    steps: int,
    writer=None,
    checkpoint_dir: Optional[str] = None,
    image_size: int = 128,
    seed: int = 0,
) -> FeatureExtractState:
    from tpgan_tpu.train.checkpoint import save_checkpoint

    rng = jax.random.PRNGKey(seed)
    state, model, tx = create_feature_extract_state(cfg, rng, image_size)
    step_fn = jax.jit(make_feature_extract_step(model, tx), donate_argnums=0)
    for i in range(steps):
        try:
            images, labels = next(batches)
        except StopIteration:
            break
        rng, srng = jax.random.split(rng)
        state, metrics = step_fn(
            state, jnp.asarray(images), jnp.asarray(labels), srng
        )
        if writer is not None and (i + 1) % 10 == 0:
            writer.write(i + 1, metrics)
    if checkpoint_dir:
        # save the MODEL VARIABLES dict ({params, batch_stats}) rather
        # than the full train state: this is the exact template the
        # consumers restore into (cli train --identity-checkpoint and
        # cli eval build it via ``fx.init``), mirroring the reference's
        # split of model vs optimizer checkpoints
        # (UtilityMethods.py:58-103)
        save_checkpoint(
            checkpoint_dir,
            int(state.step),
            jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats}
            ),
        )
    return state
