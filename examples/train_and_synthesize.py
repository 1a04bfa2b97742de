"""End-to-end example on synthetic data: a few WGAN-GP train steps,
checkpoint, restore, and synthesis — the whole user-facing API surface in
~60 lines. Run: ``python examples/train_and_synthesize.py``."""

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys

import tempfile

import numpy as np

import jax
import jax.numpy as jnp

# honor a JAX_PLATFORMS=cpu prefix even under the tunneled-TPU harness,
# whose sitecustomize forces jax_platforms="axon,cpu" via jax.config
# (config beats the env var; see tests/conftest.py for the same dance)
if _platforms := __import__("os").environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _platforms)

from tpgan_tpu.config import make_config
from tpgan_tpu.data.synthetic import synthetic_gan_batch
from tpgan_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from tpgan_tpu.train.gan_trainer import (
    create_gan_state,
    make_gan_train_step,
    make_synthesize_fn,
)


def main():
    # small model so the example runs anywhere; drop the overrides for
    # the full-size network
    cfg = make_config(
        {
            "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
            "D": {"fm_multiplier": 0.25},
            "compute_dtype": "float32",
            "train": {"batch_size": 4},
        }
    )

    rng = jax.random.PRNGKey(0)
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, rng)
    step = jax.jit(make_gan_train_step(cfg, gen, disc, g_tx, d_tx),
                   donate_argnums=0)

    for i in range(3):
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_gan_batch(cfg.train.batch_size, seed=i).items()}
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, batch, srng)
        print(f"step {i}: g_loss={float(metrics['g_loss']):.3f} "
              f"d_loss={float(metrics['d_loss']):.3f}")

    ckpt_dir = tempfile.mkdtemp(prefix="tpgan_example_ckpt_")
    save_checkpoint(ckpt_dir, int(state.step), jax.device_get(state))
    state = restore_checkpoint(ckpt_dir, state)
    print("checkpoint round-trip OK at step", int(state.step))

    synthesize = jax.jit(make_synthesize_fn(cfg, gen))
    batch = {k: jnp.asarray(v) for k, v in synthetic_gan_batch(1).items()}
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.G.zdim))
    frontal = synthesize(state.g_params, batch, z)
    print("synthesized:", frontal.shape, frontal.dtype)


if __name__ == "__main__":
    main()
