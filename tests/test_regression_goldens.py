"""Fixed-seed numerical regression pins (the 'golden-value end-to-end
step tests' of the rebuild's test strategy, SURVEY.md §4).

These values were produced by this implementation (float32, CPU) at the
commit that introduced them; any refactor that silently changes numerics
(init streams, layer semantics, loss math) will trip them. Tolerances are
loose enough to survive compiler/backend drift but tight enough to catch
semantic changes."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import LossConfig
from tpgan_tpu.losses import multitask_landmark_loss
from tpgan_tpu.losses.composite import (
    generator_loss_components,
    total_generator_loss,
)


def test_multitask_loss_golden():
    rng = np.random.RandomState(42)
    loc = jnp.asarray(rng.rand(1, 64, 2).astype(np.float32) * 128)
    cls = jnp.asarray(rng.randn(1, 64, 5).astype(np.float32))
    true = jnp.asarray(rng.rand(1, 8).astype(np.float32) * 128)
    total, aux = multitask_landmark_loss(
        loc, cls, true, jax.random.PRNGKey(7), image_size=(128, 128)
    )
    # deterministic parts: positive count fixed by geometry
    assert int(aux["num_positives"]) == 22
    np.testing.assert_allclose(float(total), 2.3396273, rtol=1e-4)


def test_generator_loss_components_golden():
    rng = np.random.RandomState(1)
    comps = generator_loss_components(
        fake128=jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32) * 0.3),
        fake_scores=jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32)),
        encoder_predict=jnp.asarray(rng.randn(2, 347).astype(np.float32)),
        fused_local_fake=jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32) * 0.3),
        fused_local_frontal=jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32) * 0.3),
        gt128=jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32) * 0.3),
        gt64=jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.3),
        gt32=jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.3),
        labels=jnp.asarray([3, 7], jnp.int32),
        cfg=LossConfig(),
    )
    got = {k: float(v) for k, v in comps.items()}
    # pinned values (float32 CPU)
    np.testing.assert_allclose(got["adv_G"], -0.0893211, rtol=1e-3)
    np.testing.assert_allclose(got["pixelwise"], 0.9733409, rtol=1e-3)
    np.testing.assert_allclose(got["pixelwise_local"], 0.3377468, rtol=1e-3)
    np.testing.assert_allclose(got["symmetry"], 0.3366080, rtol=1e-3)
    np.testing.assert_allclose(got["total_variation"], 0.6762244, rtol=1e-3)
    np.testing.assert_allclose(got["cross_entropy"], 6.7721691, rtol=1e-3)
    total = float(total_generator_loss(comps, LossConfig()))
    np.testing.assert_allclose(total, 69.8098450, rtol=1e-3)
