"""MobileNetV2 + SSDHead: prediction counts per scale, init statistics,
and loss/decoder integration on a small input."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.losses import decode_landmarks, multitask_landmark_loss
from tpgan_tpu.models.mobilenet_v2 import (
    InvertedResidual,
    MobileNetV2,
    NUM_LANDMARK_CLASSES,
    SSD_SCALES,
)


def _expected_num_predictions(size: int) -> int:
    """Prediction count from the stride pyramid. Taps: bottleneck idx 12
    (stride 16), conv2 (stride 32), extra1 (64), extra3 (128), extra4
    (256), extra6 (512) — with ceil division at each stride-2 conv."""
    def cdiv(a, b):
        return -(-a // b)

    s = cdiv(size, 2)       # stem s2
    s = cdiv(s, 2)          # block group 2 (c=24)
    s = cdiv(s, 2)          # group 3 (c=32)
    s = cdiv(s, 2)          # group 4 (c=64) -> idx 12 tap after group 5
    tap1 = s
    s5 = cdiv(s, 2)         # group 6 (c=160) -> conv2 tap
    tap2 = s5
    e1 = cdiv(s5, 2)
    e3 = cdiv(e1, 2)
    e4 = cdiv(e3, 2)
    e6 = cdiv(e4, 2)
    taps = [tap1, tap2, e1, e3, e4, e6]
    return sum(t * t * a for t, (_, a) in zip(taps, SSD_SCALES))


def test_mobilenet_forward_shapes():
    mod = MobileNetV2()
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    loc, cls = jax.jit(mod.apply)(v, jnp.ones((2, 128, 128, 3)))
    n = _expected_num_predictions(128)
    assert loc.shape == (2, n, 2)
    assert cls.shape == (2, n, NUM_LANDMARK_CLASSES)
    # coordinates are ReLU-clamped non-negative (MobileNetV2.py:67)
    assert float(jnp.min(loc)) >= 0.0


def test_inverted_residual_skip_rule():
    """Residual add iff stride==1 and in==out (MobileNetV2.py:98-99)."""
    x = jnp.ones((1, 8, 8, 16))
    m1 = InvertedResidual(16, 16, 1)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    m2 = InvertedResidual(16, 24, 1)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    y1 = m1.apply(v1, x)
    y2 = m2.apply(v2, x)
    assert y1.shape == (1, 8, 8, 16)
    assert y2.shape == (1, 8, 8, 24)
    m3 = InvertedResidual(16, 16, 2)
    v3 = m3.init(jax.random.PRNGKey(0), x)
    assert m3.apply(v3, x).shape == (1, 4, 4, 16)


def test_pretrain_loss_pipeline_end_to_end():
    """model forward -> multitask loss -> grads, all inside one jit
    (the reference's loop shuttles this through host Python,
    Pretrain.py:158-195)."""
    mod = MobileNetV2()
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    labels = jnp.asarray([[30.0, 40, 90, 40, 64, 64, 64, 90]], jnp.float32)

    @jax.jit
    def loss_fn(params, images):
        loc, cls = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, images
        )
        total, aux = multitask_landmark_loss(
            loc, cls, labels, jax.random.PRNGKey(0), image_size=(128, 128)
        )
        return total

    g = jax.grad(lambda p: loss_fn(p, jnp.ones((1, 128, 128, 3))))(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_decoder_on_model_output():
    mod = MobileNetV2()
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    loc, cls = jax.jit(mod.apply)(v, jnp.ones((1, 128, 128, 3)))
    out = jax.jit(decode_landmarks)(loc, cls)
    assert out.points.shape == (1, NUM_LANDMARK_CLASSES, 1, 2)


def test_find_best_coordinates():
    """The working replacement of the reference's dead-code helper
    (MobileNetV2.py:290-340): per-part top-1 decode regardless of the
    0.5 confidence threshold."""
    from tpgan_tpu.models.mobilenet_v2 import find_best_coordinates

    rng = np.random.RandomState(0)
    loc = jnp.asarray(rng.rand(1, 20, 2).astype(np.float32) * 100)
    cls = jnp.asarray(rng.randn(1, 20, 5).astype(np.float32) * 0.1)  # diffuse scores
    out = find_best_coordinates(loc, cls)
    # every part gets a prediction even when no score clears 0.5
    assert bool(out.valid[:, :4].all())
    scores = np.asarray(jax.nn.softmax(cls[0], axis=-1))
    for ci in range(4):
        np.testing.assert_allclose(
            np.asarray(out.points[0, ci, 0]), np.asarray(loc[0])[scores[:, ci].argmax()],
            rtol=1e-5,
        )


def test_sequential_block():
    from tpgan_tpu.ops.blocks import ConvBlock, Sequential

    seq = Sequential((
        ConvBlock(3, 8, 3, 1, 1),
        ConvBlock(8, 4, 3, 1, 1),
    ))
    v = seq.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    y = seq.apply(v, jnp.ones((2, 8, 8, 3)))
    assert y.shape == (2, 8, 8, 4)
