"""make_synthesis_pipeline: raw uint8 + 68-pt landmarks -> frontal
images, preprocessing and generator fused into one jit program."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.data.jit_preprocess import make_synthesis_pipeline
from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn

CFG = make_config(
    {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
     "D": {"fm_multiplier": 0.25}, "compute_dtype": "float32"}
)


def test_fused_pipeline_end_to_end():
    state, gen, *_ = create_gan_state(CFG, jax.random.PRNGKey(0))
    synthesize = make_synthesize_fn(CFG, gen)
    pipeline = make_synthesis_pipeline(synthesize)

    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(2, 200, 180, 3) * 255).astype(np.uint8))
    lm68 = jnp.asarray((rng.rand(2, 68, 2) * 150 + 10).astype(np.float32))
    z = jnp.zeros((2, CFG.G.zdim), jnp.float32)

    out = pipeline(state.g_params, images, lm68, z)
    assert out.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()

    # consistency: fused pipeline == separate preprocess + synthesize
    from tpgan_tpu.data.jit_preprocess import preprocess_for_synthesis

    batch = jax.jit(preprocess_for_synthesis)(images, lm68)
    want = jax.jit(synthesize)(state.g_params, batch, z)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )
