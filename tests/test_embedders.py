"""ResNet18 / FeatureExtractModel embedder tests (BASELINE config 4
scaffolding)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.models.feature_extract import (
    FeatureExtractModel,
    make_identity_embed_fn,
)
from tpgan_tpu.models.registry import get_model
from tpgan_tpu.models.resnet import ResNet18, max_pool_3x3_s2


def test_maxpool_matches_torch():
    import torch

    x = np.random.RandomState(0).randn(2, 3, 9, 9).astype(np.float32)
    want = torch.nn.MaxPool2d(3, 2, 1)(torch.from_numpy(x)).numpy()
    got = max_pool_3x3_s2(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-6
    )


def test_resnet18_forward_and_fc0():
    mod = ResNet18(num_of_output_classes=347, feature_layer_dim_before_fc=256)
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    logits, fc0 = jax.jit(mod.apply)(v, jnp.ones((2, 128, 128, 3)))
    assert logits.shape == (2, 347)
    assert fc0.shape == (2, 256)
    assert np.isfinite(np.asarray(logits)).all()


def test_resnet18_without_fc0():
    mod = ResNet18(num_of_output_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    logits, fc0 = jax.jit(mod.apply)(v, x)
    assert logits.shape == (1, 10)
    assert fc0 is None


def test_feature_extract_resnet_and_embed_fn():
    mod = FeatureExtractModel(base_model_name="resnet", num_of_output_classes=347)
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    embed = make_identity_embed_fn(mod, v)
    feats = jax.jit(embed)(jnp.ones((2, 128, 128, 3)))
    assert feats.shape == (2, 256)


def test_feature_extract_mobilenet_branch():
    mod = FeatureExtractModel(
        base_model_name="mobilenetv2", num_of_output_classes=47
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    logits, feats = jax.jit(mod.apply)(v, x)
    assert logits.shape == (1, 47)
    assert feats.shape == (1, 1280)


def test_embed_fn_bf16_compute_dtype_backprops():
    """Opt-in bf16 embedder (cli train --identity-embed-dtype bfloat16):
    f32 generator output is cast into the model's compute dtype inside
    the embed fn, and the identity loss still backpropagates a finite,
    nonzero f32 gradient into the (f32) input images."""
    mod = FeatureExtractModel(
        base_model_name="mobilenetv2",
        num_of_output_classes=11,
        dtype=jnp.bfloat16,
        accum_f32=False,  # differentiated path (ops/blocks.py:92-96)
    )
    x = jnp.zeros((1, 64, 64, 3))  # f32 init — params stay f32
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    assert v["params"]["base"]["stem"]["kernel"].dtype == jnp.float32
    embed = make_identity_embed_fn(mod, v)

    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    )
    feats = jax.jit(embed)(imgs)
    assert feats.shape == (2, 1280)
    assert np.isfinite(np.asarray(feats, np.float32)).all()

    def loss(im):
        return jnp.sum(jnp.abs(embed(im).astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))(imgs)
    assert g.dtype == jnp.float32
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_registry_replaces_eval():
    mod = get_model("mobilenetv2")
    assert type(mod).__name__ == "MobileNetV2"
    import pytest

    with pytest.raises(KeyError):
        get_model("nope")


def test_augment_batch_properties():
    from tpgan_tpu.train.feature_extract import augment_batch

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)
    key = jax.random.PRNGKey(3)
    out = jax.jit(augment_batch)(key, x)
    assert out.shape == x.shape and out.dtype == x.dtype
    assert np.isfinite(np.asarray(out)).all()
    # deterministic under the same key, varies under another
    out2 = jax.jit(augment_batch)(key, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = jax.jit(augment_batch)(jax.random.PRNGKey(4), x)
    assert not np.allclose(np.asarray(out), np.asarray(out3))
    # jitter is mild: values stay in a sane band around the input range
    assert np.abs(np.asarray(out)).max() < 1.5


def test_evaluate_embedder_identity_protocol():
    """Held-out-subject validation: a fresh (random) embedder scores the
    protocol without error; a contrived perfect embedding scores 1.0."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.feature_extract import (
        create_feature_extract_state,
        evaluate_embedder_identity,
    )

    cfg = make_config(
        {"feature_extract_model": {"num_of_output_classes": 7}}
    )
    state, model, _tx = create_feature_extract_state(
        cfg, jax.random.PRNGKey(0), image_size=32
    )
    rng = np.random.RandomState(0)
    gallery = rng.rand(3, 32, 32, 3).astype(np.float32)
    # probes: mild noise on the gallery images, two per subject
    probes = np.concatenate([gallery, gallery]) + \
        rng.randn(6, 32, 32, 3).astype(np.float32) * 0.01
    out = evaluate_embedder_identity(
        model, state,
        probes, np.asarray([5, 6, 9, 5, 6, 9], np.int32),
        gallery, np.asarray([5, 6, 9], np.int32),
        chunk=4,
    )
    assert set(out) == {"val_rank1", "val_identity_sim", "val_probes"}
    assert out["val_probes"] == 6
    assert 0.0 <= out["val_rank1"] <= 1.0
    assert -1.0 <= out["val_identity_sim"] <= 1.0
