"""WGAN-GP adversarial losses.

The reference configures but never implements GAN training; the design is
pinned by ``loss['weight_gradient_penalty']=10`` (config.py:72), the
``weight_adv_G`` term (config.py:79), the PatchGAN critic
(D_and_G_model.py:409-435) and ``set_requires_grad``
(UtilityMethods.py:43-56). TPU-natively, the G/D alternation is a single
jitted step with ``stop_gradient`` instead of requires_grad toggling, and
the gradient penalty's second-order grad is plain ``jax.grad`` through the
critic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def discriminator_loss(
    real_scores: jnp.ndarray, fake_scores: jnp.ndarray
) -> jnp.ndarray:
    """Wasserstein critic loss: E[D(fake)] - E[D(real)] (minimised).

    Scores are PatchGAN maps (B, 4, 4, 1); the expectation runs over all
    local patches."""
    return jnp.mean(fake_scores) - jnp.mean(real_scores)


def generator_adversarial_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """-E[D(fake)]."""
    return -jnp.mean(fake_scores)


def gradient_penalty(
    critic: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """WGAN-GP: E[(||grad_x D(x_hat)||_2 - 1)^2] with x_hat a random
    per-sample interpolation between real and fake."""
    b = real.shape[0]
    eps = jax.random.uniform(rng, (b, 1, 1, 1), dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    grads = jax.grad(lambda x: jnp.sum(critic(x)))(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))
