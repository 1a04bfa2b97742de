"""Full inference stack (detector -> preprocess -> generator) and the
identity-embedder training step."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.api import (
    landmarks5_from_detection,
    make_full_inference_fn,
    preprocess_from_landmarks5,
)
from tpgan_tpu.config import make_config


def test_landmarks5_expansion():
    pts = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 2))
    lm5 = landmarks5_from_detection(pts)
    assert lm5.shape == (1, 5, 2)
    np.testing.assert_allclose(np.asarray(lm5[0, 3]), np.asarray(pts[0, 3]))
    np.testing.assert_allclose(np.asarray(lm5[0, 4]), np.asarray(pts[0, 3]))
    # crop geometry's mouth-centre averaging recovers the centre exactly


def test_preprocess_from_landmarks5():
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 200, 180, 3).astype(np.float32)
    lm5 = (rng.rand(2, 5, 2) * 150 + 10).astype(np.float32)
    out = jax.jit(preprocess_from_landmarks5)(jnp.asarray(imgs), jnp.asarray(lm5))
    assert out["img"].shape == (2, 128, 128, 3)
    assert out["left_eye"].shape == (2, 40, 40, 3)


def test_full_inference_fn_shapes():
    """Detector + generator with random weights — validates the whole
    chained graph compiles and produces frontal images."""
    from tpgan_tpu.models.mobilenet_v2 import MobileNetV2
    from tpgan_tpu.train.gan_trainer import build_models

    cfg = make_config(
        {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
         "compute_dtype": "float32"}
    )
    gen, _ = build_models(cfg)
    det = MobileNetV2()
    g_vars = jax.jit(gen.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 40, 40, 3)),
        jnp.zeros((1, 40, 40, 3)), jnp.zeros((1, 32, 40, 3)),
        jnp.zeros((1, 32, 48, 3)), jnp.zeros((1, 64)),
    )
    det_vars = jax.jit(det.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3))
    )

    infer = jax.jit(make_full_inference_fn(gen, detector_input_size=128))
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(2, 160, 140, 3).astype(np.float32)
    )
    z = jnp.zeros((2, 64))
    out = infer(g_vars["params"], det_vars, imgs, z)
    assert out.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_feature_extract_training_step():
    from tpgan_tpu.train.feature_extract import (
        create_feature_extract_state,
        make_feature_extract_step,
    )

    cfg = make_config({"feature_extract_model": {"num_of_output_classes": 7}})
    state, model, tx = create_feature_extract_state(
        cfg, jax.random.PRNGKey(0), image_size=64
    )
    step = jax.jit(make_feature_extract_step(model, tx), donate_argnums=0)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 7, (4,)), jnp.int32)
    before = np.asarray(
        jax.tree.leaves(state.params)[0]
    ).copy()
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    after = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(after, before)


def test_embedder_checkpoint_restores_into_consumer_template(tmp_path):
    """run_feature_extract_training saves {params, batch_stats} — exactly
    the template cli train --identity-checkpoint / cli eval restore into
    (a full train-state checkpoint would fail the strict restore)."""
    from tpgan_tpu.models.feature_extract import (
        FeatureExtractModel,
        make_identity_embed_fn,
    )
    from tpgan_tpu.train.checkpoint import restore_checkpoint
    from tpgan_tpu.train.feature_extract import run_feature_extract_training

    cfg = make_config({"feature_extract_model": {"num_of_output_classes": 5}})
    rng = np.random.RandomState(0)

    def batches():
        while True:
            yield (rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1,
                   rng.randint(0, 5, (4,)).astype(np.int32))

    ck = str(tmp_path / "ck")
    run_feature_extract_training(
        cfg, batches(), steps=1, checkpoint_dir=ck, image_size=64
    )

    # the consumer-side restore path (cli.py cmd_train)
    fx = FeatureExtractModel(
        base_model_name=cfg.feature_extract_model.base_model_name,
        num_of_output_classes=cfg.feature_extract_model.num_of_output_classes,
    )
    fx_vars = jax.jit(fx.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    fx_vars = restore_checkpoint(ck, fx_vars)
    embed = jax.jit(make_identity_embed_fn(fx, fx_vars))
    feats = embed(jnp.zeros((2, 64, 64, 3)))
    assert np.isfinite(np.asarray(feats)).all()
