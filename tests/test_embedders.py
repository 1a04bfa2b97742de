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


def test_registry_replaces_eval():
    mod = get_model("mobilenetv2")
    assert type(mod).__name__ == "MobileNetV2"
    import pytest

    with pytest.raises(KeyError):
        get_model("nope")
